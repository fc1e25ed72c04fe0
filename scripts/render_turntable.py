#!/usr/bin/env python
"""Render a turntable animation from a trained point cloud.

The TPU-native analog of the reference's qualitative training artifact
(assets/example_train_lego.gif):

    python -m scripts.render_turntable --ply out/point_cloud/iteration_6999/point_cloud.ply
"""

import argparse

import numpy as np


def orbit_camera(theta: float, radius: float, height: float,
                 width: int, size: int, camera_angle_x: float):
    from scripts.make_tiny_nerf import look_at_c2w

    from gstpu.utils.camera import load_camera

    eye = np.array([radius * np.cos(theta), radius * np.sin(theta), height])
    c2w = look_at_c2w(eye)
    focal = 0.5 * width / np.tan(0.5 * camera_angle_x)
    return load_camera({"camera_id": 0, "camera_to_world": c2w,
                        "width": width, "height": size, "focal": focal})


def main():
    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from gstpu.config import RenderSettings
    from gstpu.ops.rasterize import render
    from gstpu.utils.ply import load_ply

    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", required=True)
    ap.add_argument("--out", default="turntable.gif")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--size", type=int, default=400)
    ap.add_argument("--radius", type=float, default=4.0)
    ap.add_argument("--height", type=float, default=1.5)
    ap.add_argument("--fov", type=float, default=0.6911112070083618)
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()

    from gstpu.utils.ply import render_space_params
    params = render_space_params(load_ply(args.ply))
    n = params["positions"].shape[0]
    use_pallas = not args.no_pallas and jax.default_backend() == "tpu"
    settings = RenderSettings(width=args.size, height=args.size,
                              pair_capacity=1 << 20, use_pallas=use_pallas)
    j = jnp.asarray
    arrs = (j(params["positions"]), j(params["scales"]),
            j(params["rotations"]), j(params["opacities"]),
            j(params["shs"].reshape(n, 16, 3)))

    cam0 = orbit_camera(0.0, args.radius, args.height, args.size, args.size,
                        args.fov)

    @jax.jit
    def fn(view, proj, campos):
        img, _, _ = render(settings, cam0["tan_fovx"], cam0["tan_fovy"], 1.0,
                           *arrs, view, proj, campos,
                           jnp.zeros(3, jnp.float32), None, jnp.int32(0))
        return jnp.clip(img, 0.0, 1.0)

    frames = []
    for i in range(args.frames):
        cam = orbit_camera(2 * np.pi * i / args.frames, args.radius,
                           args.height, args.size, args.size, args.fov)
        img = fn(j(cam["world_to_camera"]), j(cam["full_proj_matrix"]),
                 j(cam["camera_center"]))
        frames.append((np.asarray(img) * 255).astype(np.uint8))
    imageio.mimwrite(args.out, frames, loop=0, duration=50)
    print(f"wrote {args.frames}-frame turntable to {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Evaluate a trained point cloud against a dataset split — the analog of
the official 3DGS ``render.py`` + ``metrics.py`` workflow (the reference
has no evaluation at all; SURVEY §5 metrics row).

    python -m scripts.eval_model --ply out/point_cloud/iteration_6999/point_cloud.ply \
        --dataset ./data/lego [--split test] [-r 2] [--save-renders DIR]

Prints one JSON line with mean PSNR/SSIM over the split (and writes the
rendered views if asked).  Works for NeRF-synthetic datasets and COLMAP
captures (auto-detected), with any 3DGS-schema PLY — ours, the
reference's, or an official-3DGS export.
"""

import argparse
import json


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gstpu.config import RenderSettings
    from gstpu.data.colmap import ColmapDataset, is_colmap_dataset
    from gstpu.data.nerf import NerfSyntheticDataset
    from gstpu.ops.losses import psnr, ssim
    from gstpu.ops.rasterize import render
    from gstpu.utils.ply import load_ply

    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--resolution", "-r", type=int, default=1)
    ap.add_argument("--max-views", type=int, default=None)
    ap.add_argument("--save-renders", default=None,
                    help="directory for the rendered PNGs")
    ap.add_argument("--white-background", action="store_true")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--activated", action="store_true",
                    help="the PLY stores log-scales/logit-opacities "
                         "(official 3DGS / gstpu --activated exports)")
    args = ap.parse_args()

    ds_cls = ColmapDataset if is_colmap_dataset(args.dataset) \
        else NerfSyntheticDataset
    ds = ds_cls(args.dataset, args.split, downscale=args.resolution,
                white_background=args.white_background)

    from gstpu.utils.ply import render_space_params
    params = load_ply(args.ply)
    if args.activated:  # explicit override for comment-less foreign PLYs
        params["parameterization"] = "activated"
    params = render_space_params(params)
    n = params["positions"].shape[0]
    j = jnp.asarray
    scales = params["scales"]
    opac = params["opacities"]
    arrs = (j(params["positions"]), j(scales), j(params["rotations"]),
            j(opac), j(params["shs"].reshape(n, 16, 3)))

    use_pallas = not args.no_pallas and jax.default_backend() == "tpu"
    bg = jnp.full((3,), 1.0 if args.white_background else 0.0, jnp.float32)

    def make_fn(pair_capacity: int):
        settings = RenderSettings(width=ds.width, height=ds.height,
                                  pair_capacity=pair_capacity,
                                  use_pallas=use_pallas, tight_radius=True)

        @jax.jit
        def fn(view, proj, campos, tan_fovx, tan_fovy):
            img, _, aux = render(settings, tan_fovx, tan_fovy, 1.0, *arrs,
                                 view, proj, campos, bg, None, jnp.int32(0))
            return jnp.clip(img, 0.0, 1.0), aux.num_pairs
        return fn

    # pair-list overflow would silently drop tiles and report metrics of a
    # partially rendered image — check the reported pair count per view and
    # regrow (recompile) until every view fits (same contract as
    # Trainer._render_full)
    pair_capacity = 1 << 20
    fn = make_fn(pair_capacity)

    def render_checked(view, proj, campos, tan_fovx, tan_fovy):
        nonlocal fn, pair_capacity
        img, num_pairs = fn(view, proj, campos, tan_fovx, tan_fovy)
        while int(num_pairs) > pair_capacity:
            pair_capacity = -(-int(num_pairs) * 3 // 2 // 32768) * 32768
            fn = make_fn(pair_capacity)
            img, num_pairs = fn(view, proj, campos, tan_fovx, tan_fovy)
        return img

    if args.save_renders:
        import os

        os.makedirs(args.save_renders, exist_ok=True)

    n_views = len(ds) if args.max_views is None \
        else min(args.max_views, len(ds))
    psnrs, ssims = [], []
    for i in range(n_views):
        cam = ds.camera(i)
        img = render_checked(j(cam["world_to_camera"]),
                             j(cam["full_proj_matrix"]),
                             j(cam["camera_center"]),
                             cam["tan_fovx"], cam["tan_fovy"])
        target = j(ds.image(i))
        psnrs.append(float(psnr(img, target)))
        ssims.append(float(ssim(img, target, clamp_sigma=True)))
        if args.save_renders:
            import imageio.v2 as imageio

            imageio.imwrite(f"{args.save_renders}/{i:05d}.png",
                            (np.asarray(img) * 255).astype(np.uint8))

    print(json.dumps({
        "ply": args.ply, "split": args.split, "views": n_views,
        "n_gaussians": n, "resolution": f"{ds.width}x{ds.height}",
        "psnr": round(float(np.mean(psnrs)), 4),
        "ssim": round(float(np.mean(ssims)), 4),
        "psnr_per_view_min": round(float(np.min(psnrs)), 4),
    }))


if __name__ == "__main__":
    main()

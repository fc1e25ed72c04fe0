#!/usr/bin/env python
"""Forward-pass smoke test: render 3 hardcoded Gaussians (reference render.py).

Saves ``example_render.png``; deterministic inputs make this the known-good
fixture (SURVEY §4 item 1).
"""

import math

import numpy as np

from gstpu.render import render_gaussians
from gstpu.utils.camera import projection_matrix, world_to_view


def setup_example_scene(image_width=1800, image_height=1800,
                        fovx=45.0, fovy=45.0, znear=0.01, zfar=100.0):
    """The reference smoke-test scene (render.py:11-82), including its quirk
    of passing fov in *radians-as-degrees* straight into tan()."""
    T = np.array([0, 0, 5], dtype=np.float32)
    R = np.array([[1, 0, 0], [0, 1, 0], [0, 0, -1]], dtype=np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R
    w2c[:3, 3] = T
    w2c = w2c.T

    view_matrix = world_to_view(R=R, t=T)
    proj = projection_matrix(fovx=fovx, fovy=fovy, znear=znear, zfar=zfar).T
    full_proj = w2c @ proj
    camera_center = np.linalg.inv(w2c)[3, :3]
    tan_fovx = math.tan(fovx * 0.5)
    tan_fovy = math.tan(fovy * 0.5)

    pts = np.array([[-5, 0, -10], [0, 0, -10], [5, 0, -10]], dtype=np.float32)
    n = len(pts)
    shs = np.array([[0.71734341, 0.91905449, 0.49961076],
                    [0.08068483, 0.82132256, 0.01301602],
                    [0.8335743, 0.31798138, 0.19709007],
                    [0.82589597, 0.28206231, 0.790489],
                    [0.24008527, 0.21312673, 0.53132892],
                    [0.19493135, 0.37989934, 0.61886235],
                    [0.98106522, 0.28960672, 0.57313965],
                    [0.92623716, 0.46034381, 0.5485369],
                    [0.81660616, 0.7801104, 0.27813915],
                    [0.96114063, 0.69872817, 0.68313804],
                    [0.95464185, 0.21984855, 0.92912192],
                    [0.23503135, 0.29786121, 0.24999751],
                    [0.29844887, 0.6327788, 0.05423596],
                    [0.08934335, 0.11851827, 0.04186001],
                    [0.59331831, 0.919777, 0.71364335],
                    [0.83377388, 0.40242542, 0.8792624]] * n,
                   dtype=np.float32).reshape(n, 16, 3)
    opacities = np.ones((n, 1), dtype=np.float32)
    scales = np.ones((n, 3), dtype=np.float32)
    rotations = np.zeros((n, 4), dtype=np.float32)
    rotations[:, 3] = 1.0
    camera = {
        "view_matrix": view_matrix, "full_proj_matrix": full_proj,
        "camera_center": camera_center, "tan_fovx": tan_fovx,
        "tan_fovy": tan_fovy, "width": image_width, "height": image_height,
    }
    return pts, shs, scales, rotations, opacities, camera


if __name__ == "__main__":
    width = height = 1800
    pts, shs, scales, rotations, opacities, cam = setup_example_scene(
        width, height)
    print(f"Created example scene with {len(pts)} Gaussians")
    image, depth, aux = render_gaussians(
        background=np.zeros(3, np.float32),
        means3D=pts, opacity=opacities, scales=scales, rotations=rotations,
        viewmatrix=cam["view_matrix"], projmatrix=cam["full_proj_matrix"],
        tan_fovx=cam["tan_fovx"], tan_fovy=cam["tan_fovy"],
        image_height=height, image_width=width, sh=shs, degree=3,
        campos=cam["camera_center"], debug=True)
    print("Rendering completed")
    import imageio.v2 as imageio
    img8 = (np.clip(np.asarray(image), 0, 1) * 255).astype(np.uint8)
    imageio.imwrite("example_render.png", img8)
    print("Rendered image saved to example_render.png")

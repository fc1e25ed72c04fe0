"""Shared test scenes."""

from __future__ import annotations

import math

import numpy as np

from gstpu.utils.camera import projection_matrix, world_to_view


def example_camera(width=128, height=128, fovx=45.0, fovy=45.0,
                   znear=0.01, zfar=100.0):
    """The reference render.py camera (render.py:11-49), scaled down.

    Note the reference passes fovx=45.0 *radians* into tan(fov/2) — a quirk of
    its smoke test we keep for fixture parity.
    """
    T = np.array([0, 0, 5], dtype=np.float32)
    R = np.array([[1, 0, 0], [0, 1, 0], [0, 0, -1]], dtype=np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R
    w2c[:3, 3] = T
    w2c = w2c.T
    view = world_to_view(R=R, t=T)
    proj = projection_matrix(fovx=fovx, fovy=fovy, znear=znear, zfar=zfar).T
    full_proj = (w2c @ proj).astype(np.float32)
    campos = np.linalg.inv(w2c)[3, :3].astype(np.float32)
    return {
        "view": view.astype(np.float32),
        "proj": full_proj,
        "campos": campos,
        "tan_fovx": math.tan(fovx * 0.5),
        "tan_fovy": math.tan(fovy * 0.5),
        "width": width,
        "height": height,
    }


def three_gaussian_scene():
    """The reference smoke-test Gaussians (render.py:52-82)."""
    pts = np.array([[-5, 0, -10], [0, 0, -10], [5, 0, -10]], dtype=np.float32)
    n = len(pts)
    base = np.array([[0.71734341, 0.91905449, 0.49961076],
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
                     [0.83377388, 0.40242542, 0.8792624]], dtype=np.float32)
    shs = np.tile(base[None], (n, 1, 1))
    opacities = np.ones(n, dtype=np.float32)
    scales = np.ones((n, 3), dtype=np.float32)
    rotations = np.zeros((n, 4), dtype=np.float32)
    rotations[:, 3] = 1.0
    return pts, shs, scales, rotations, opacities


def random_scene(rng: np.random.Generator, n=64, extent=3.0, z_center=-10.0,
                 opacity_range=(0.2, 0.9), scale_range=(0.1, 0.8)):
    """Random anisotropic Gaussians in front of the example camera."""
    pts = np.empty((n, 3), np.float32)
    pts[:, 0] = rng.uniform(-extent, extent, n)
    pts[:, 1] = rng.uniform(-extent, extent, n)
    pts[:, 2] = rng.uniform(z_center - 2.0, z_center + 2.0, n)
    shs = rng.normal(0.0, 0.3, (n, 16, 3)).astype(np.float32)
    shs[:, 0] = rng.uniform(-0.5, 1.5, (n, 3))
    opacities = rng.uniform(*opacity_range, n).astype(np.float32)
    scales = rng.uniform(*scale_range, (n, 3)).astype(np.float32)
    q = rng.normal(0, 1, (n, 4)).astype(np.float32)
    rotations = q / np.linalg.norm(q, axis=1, keepdims=True)
    return pts, shs.astype(np.float32), scales, rotations, opacities

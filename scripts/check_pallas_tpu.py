#!/usr/bin/env python
"""Fast correctness check: Pallas kernels vs XLA reference path on TPU.

Runs both composite paths on a moderate random scene and reports max abs
diffs.  Much faster than the interpret-mode CPU tests for kernel iteration.
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gstpu.config import RenderSettings
    from gstpu.ops import pallas_rasterize
    from gstpu.ops.binning import build_pairs
    from gstpu.ops.preprocess import preprocess
    from gstpu.ops.rasterize import composite_backward, composite_forward
    from tests.scenes import example_camera, random_scene

    n = 20_000
    w = h = 256
    rng = np.random.default_rng(3)
    cam = example_camera(width=w, height=h)
    pts, shs, scales, rotations, opacities = random_scene(
        rng, n=n, extent=1.3, z_center=-8.0,
        opacity_range=(0.05, 0.95), scale_range=(0.01, 0.08))
    j = jnp.asarray
    settings = RenderSettings(width=w, height=h, pair_capacity=1 << 18)
    prep = jax.jit(lambda *a: preprocess(
        *a, w, h, cam["tan_fovx"], cam["tan_fovy"], settings.grid_x,
        settings.grid_y, 3))(
        j(pts), j(scales), j(rotations), j(opacities), j(shs),
        j(cam["view"]), j(cam["proj"]), j(cam["campos"]))
    pairs = jax.jit(lambda tt, r, d: build_pairs(
        tt, r, d, settings.grid_x, settings.num_tiles,
        settings.pair_capacity))(prep.tiles_touched, prep.rect, prep.depth)
    print("num_pairs:", int(pairs.num_pairs))

    cx, dx, tx, nx = jax.jit(
        lambda pr, p: composite_forward(pr, p, settings))(prep, pairs)
    cp, dp, tp, np_ = jax.jit(
        lambda pr, p: pallas_rasterize.composite_forward(
            pr, p, settings))(prep, pairs)
    print("fwd color maxdiff:", float(jnp.max(jnp.abs(cx - cp))))
    print("fwd depth maxdiff:", float(jnp.max(jnp.abs(dx - dp))))
    print("fwd finalT maxdiff:", float(jnp.max(jnp.abs(tx - tp))))
    print("fwd ncontrib maxdiff:", int(jnp.max(jnp.abs(nx - np_))))

    bg = jnp.zeros(3, jnp.float32)
    rng2 = np.random.default_rng(7)
    dl_dpix = j(rng2.normal(size=(settings.num_tiles, 256, 3))
                .astype(np.float32))
    outs_x = jax.jit(lambda pr, p, c, t, d: composite_backward(
        pr, p, settings, c, t, d, bg))(prep, pairs, cx, tx, dl_dpix)
    outs_p = jax.jit(lambda pr, p, c, t, d: pallas_rasterize.composite_backward(
        pr, p, settings, c, t, d, bg))(prep, pairs, cx, tx, dl_dpix)
    for name, a, b in zip(("d_color", "d_mean2d", "d_conic", "d_opac",
                           "d_invdepth"), outs_x, outs_p):
        scale = float(jnp.max(jnp.abs(a))) or 1.0
        print(f"bwd {name} rel maxdiff: {float(jnp.max(jnp.abs(a - b)))/scale:.3e}")


if __name__ == "__main__":
    main()

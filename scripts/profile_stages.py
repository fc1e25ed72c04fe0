#!/usr/bin/env python
"""Per-stage timing of the render pipeline on the current backend.

The remote-TPU tunnel charges a fixed ~27ms per host sync and does not truly
block before the first D2H transfer, so we (a) poison the stream with one
readback up front and (b) report the slope between two iteration counts,
which cancels the fixed per-sync overhead.
"""

import sys
import time

import numpy as np

N = 100_000
W = H = 800
CAP = 1 << 19


def _run(fn, args, iters):
    import jax
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def timeit(fn, *args, lo=5, hi=25):
    _run(fn, args, 2)  # warmup/compile
    a = _run(fn, args, lo)
    b = _run(fn, args, hi)
    return (b - a) / (hi - lo) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from gstpu.config import RenderSettings
    from gstpu.ops import pallas_rasterize
    from gstpu.ops.binning import build_pairs
    from gstpu.ops.preprocess import preprocess
    from gstpu.ops.rasterize import composite_forward, render
    from tests.scenes import example_camera, random_scene

    rng = np.random.default_rng(0)
    cam = example_camera(width=W, height=H)
    pts, shs, scales, rotations, opacities = random_scene(
        rng, n=N, extent=1.3, z_center=-10.0,
        opacity_range=(0.05, 0.9), scale_range=(0.01, 0.05))
    j = jnp.asarray
    means, scales, rotations, opacities, shs = (
        j(pts), j(scales), j(rotations), j(opacities), j(shs))
    view, proj, campos = j(cam["view"]), j(cam["proj"]), j(cam["campos"])
    bg = jnp.zeros(3, jnp.float32)
    settings = RenderSettings(width=W, height=H, pair_capacity=CAP)

    # poison: force the tunnel intotruly synchronous mode before timing anything
    _ = int(jnp.sum(means).astype(jnp.int32))

    prep_fn = jax.jit(lambda *a: preprocess(
        *a, W, H, cam["tan_fovx"], cam["tan_fovy"], settings.grid_x,
        settings.grid_y, 3))
    prep = prep_fn(means, scales, rotations, opacities, shs, view, proj, campos)
    print(f"preprocess:     {timeit(prep_fn, means, scales, rotations, opacities, shs, view, proj, campos):8.2f} ms")

    pairs_fn = jax.jit(lambda tt, rect, d: build_pairs(
        tt, rect, d, settings.grid_x, settings.num_tiles,
        settings.pair_capacity))
    pairs = pairs_fn(prep.tiles_touched, prep.rect, prep.depth)
    print(f"num_pairs = {int(pairs.num_pairs)} / capacity {settings.pair_capacity}")
    print(f"binning:        {timeit(pairs_fn, prep.tiles_touched, prep.rect, prep.depth):8.2f} ms")

    tc = np.asarray(pairs.tile_count)
    print(f"tile_count: max={tc.max()} mean={tc.mean():.1f} p99={np.percentile(tc, 99):.0f}")

    align_fn = jax.jit(lambda p: pallas_rasterize._aligned_layout(
        p, settings.num_tiles))
    align_fn(pairs)
    print(f"aligned_layout: {timeit(align_fn, pairs):8.2f} ms")

    feat_fn = jax.jit(lambda p, pr: pallas_rasterize._build_feat(
        pr, p,
        *pallas_rasterize._aligned_layout(p, settings.num_tiles)[1:3]))
    print(f"align+feat:     {timeit(feat_fn, pairs, prep):8.2f} ms")

    fwd_pallas = jax.jit(lambda pr, p: pallas_rasterize.composite_forward(
        pr, p, settings))
    color, dacc, final_t, ncontrib = fwd_pallas(prep, pairs)
    print(f"pallas fwd:     {timeit(fwd_pallas, prep, pairs):8.2f} ms")

    dl_dpix = jnp.ones((settings.num_tiles, 256, 3), jnp.float32) / (H * W * 3)
    bwd_pallas = jax.jit(lambda pr, p, c, ft: pallas_rasterize.composite_backward(
        pr, p, settings, c, ft, dl_dpix, bg))
    bwd_pallas(prep, pairs, color, final_t)
    print(f"pallas bwd:     {timeit(bwd_pallas, prep, pairs, color, final_t):8.2f} ms")

    from gstpu.ops.rasterize import render as full_render
    import functools

    @jax.jit
    def fwd_only(m, s_, r, o, sh):
        return full_render(settings, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                           m, s_, r, o, sh, view, proj, campos, bg, None,
                           jnp.int32(0))[0]
    fwd_only(means, scales, rotations, opacities, shs)
    print(f"full fwd:       {timeit(fwd_only, means, scales, rotations, opacities, shs):8.2f} ms")

    @jax.jit
    def fwd_bwd(m, s_, r, o, sh):
        def loss(m_, s2, r2, o2, sh2):
            img = full_render(settings, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                              m_, s2, r2, o2, sh2, view, proj, campos, bg,
                              None, jnp.int32(0))[0]
            return jnp.sum(img)
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(m, s_, r, o, sh)
    fwd_bwd(means, scales, rotations, opacities, shs)
    print(f"full fwd+bwd:   {timeit(fwd_bwd, means, scales, rotations, opacities, shs):8.2f} ms")

    if "--xla" in sys.argv:
        fwd_xla = jax.jit(lambda pr, p: composite_forward(pr, p, settings))
        fwd_xla(prep, pairs)
        print(f"xla fwd:        {timeit(fwd_xla, prep, pairs):8.2f} ms")


if __name__ == "__main__":
    main()

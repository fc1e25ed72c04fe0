#!/usr/bin/env python
"""Per-stage timing of the render pipeline on the current backend.

The remote-TPU tunnel charges a fixed ~27ms per host sync and does not truly
block before the first D2H transfer, so we (a) poison the stream with one
readback up front and (b) report the slope between two iteration counts,
which cancels the fixed per-sync overhead.

Flags:
  --fitted        fit the pair capacities to the scene (bench.py's sizing)
                  instead of the padded CAP default
  --band N [D]    profile device D's (default 0) round-robin band at N
                  devices (the sharded step's per-device work) — combine
                  with --fitted for the real multi-chip per-device cost
  --xla           also time the XLA (non-Pallas) compositing path
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
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gstpu.config import RenderSettings
    from gstpu.ops import pallas_rasterize
    from gstpu.ops.binning import build_pairs
    from gstpu.ops.preprocess import preprocess
    from gstpu.ops.rasterize import (clip_rect_to_band, composite_forward,
                                     render as full_render)
    from tests.scenes import example_camera, random_scene

    jax.config.update("jax_compilation_cache_dir", "/tmp/gstpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    fitted = "--fitted" in sys.argv
    band_n, band_d = 1, 0
    if "--band" in sys.argv:
        i = sys.argv.index("--band")
        band_n = int(sys.argv[i + 1])
        if len(sys.argv) > i + 2 and sys.argv[i + 2].isdigit():
            band_d = int(sys.argv[i + 2])

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
    settings = RenderSettings(width=W, height=H, pair_capacity=CAP,
                              tight_radius=fitted,
                              use_pallas=jax.default_backend() == "tpu")

    # poison: force the tunnel into truly synchronous mode before timing
    _ = int(jnp.sum(means).astype(jnp.int32))

    prep_fn = jax.jit(lambda *a: preprocess(
        *a, W, H, cam["tan_fovx"], cam["tan_fovy"], settings.grid_x,
        settings.grid_y, 3, tight_radius=settings.tight_radius))
    prep = prep_fn(means, scales, rotations, opacities, shs, view, proj,
                   campos)
    print(f"preprocess:     {timeit(prep_fn, means, scales, rotations, opacities, shs, view, proj, campos):8.2f} ms")

    rect_np = np.asarray(prep.rect)
    tiles_np = np.asarray(prep.tiles_touched)
    band_rows = -(-settings.grid_y // band_n)
    if band_n > 1:
        settings = dataclasses.replace(settings, tile_rows=band_rows,
                                       row_stride=band_n)
    row0 = jnp.int32(band_d)
    rect_b, tiles_b = clip_rect_to_band(prep.rect, prep.tiles_touched, row0,
                                        band_rows, band_n)
    live = int(np.asarray(tiles_b).sum())
    del rect_np, tiles_np
    if fitted:
        cap = -(-int(live * 1.05) // 8192) * 8192
        settings = dataclasses.replace(settings, pair_capacity=cap)
    num_tiles = settings.band_tiles
    print(f"band n={band_n} d={band_d}: live={live} cap={settings.pair_capacity} "
          f"tiles={num_tiles}")

    pairs_fn = jax.jit(lambda tt, rect, d: build_pairs(
        tt, rect, d, settings.grid_x, num_tiles, settings.pair_capacity))
    pairs = pairs_fn(tiles_b, rect_b, prep.depth)
    print(f"num_pairs = {int(pairs.num_pairs)} / capacity {settings.pair_capacity}")
    print(f"binning:        {timeit(pairs_fn, tiles_b, rect_b, prep.depth):8.2f} ms")

    tc = np.asarray(pairs.tile_count)
    print(f"tile_count: max={tc.max()} mean={tc.mean():.1f} p99={np.percentile(tc, 99):.0f}")

    layout_fn = jax.jit(pallas_rasterize.prepare_layout)
    layout = layout_fn(prep, pairs)
    print(f"feat build:     {timeit(layout_fn, prep, pairs):8.2f} ms")

    fwd_pallas = jax.jit(lambda pr, p, lo_: pallas_rasterize.composite_forward(
        pr, p, settings, row0=row0, layout=lo_))
    color, dacc, final_t, ncontrib = fwd_pallas(prep, pairs, layout)
    print(f"pallas fwd:     {timeit(fwd_pallas, prep, pairs, layout):8.2f} ms")

    dl_dpix = jnp.ones((num_tiles, 256, 3), jnp.float32) / (H * W * 3)
    dl_dd = jnp.zeros((num_tiles, 256), jnp.float32)
    bwd_pallas = jax.jit(
        lambda pr, p, c, ft, da, lo_: pallas_rasterize.composite_backward(
            pr, p, settings, c, ft, dl_dpix, bg, row0=row0, layout=lo_,
            depth_acc=da, dl_ddepth=dl_dd))
    bwd_pallas(prep, pairs, color, final_t, dacc, layout)
    print(f"pallas bwd:     {timeit(bwd_pallas, prep, pairs, color, final_t, dacc, layout):8.2f} ms")

    @jax.jit
    def fwd_only(m, s_, r, o, sh):
        return full_render(settings, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                           m, s_, r, o, sh, view, proj, campos, bg, None,
                           row0)[0]
    fwd_only(means, scales, rotations, opacities, shs)
    print(f"full fwd:       {timeit(fwd_only, means, scales, rotations, opacities, shs):8.2f} ms")

    target = j(rng.uniform(0, 1, (band_rows * 16 if band_n > 1 else H,
                                  settings.grid_x * 16 if band_n > 1 else W,
                                  3)).astype(np.float32))

    @jax.jit
    def fwd_bwd(m, s_, r, o, sh):
        def loss(m_, s2, r2, o2, sh2):
            img = full_render(settings, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                              m_, s2, r2, o2, sh2, view, proj, campos, bg,
                              None, row0)[0]
            return jnp.sum(jnp.abs(img - target))
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(m, s_, r, o, sh)
    fwd_bwd(means, scales, rotations, opacities, shs)
    print(f"full fwd+bwd:   {timeit(fwd_bwd, means, scales, rotations, opacities, shs):8.2f} ms")

    if "--xla" in sys.argv:
        fwd_xla = jax.jit(lambda pr, p: composite_forward(pr, p, settings,
                                                          row0=row0))
        fwd_xla(prep, pairs)
        print(f"xla fwd:        {timeit(fwd_xla, prep, pairs):8.2f} ms")


if __name__ == "__main__":
    main()

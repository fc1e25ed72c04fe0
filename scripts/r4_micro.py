#!/usr/bin/env python
"""Round-4 micro-measurements: epilogue/binning/feat sub-stage costs and
padded-lane volume statistics, at the bench scene. Run on the TPU."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N = 100_000
W = H = 800


def timeit(fn, *args, lo=5, hi=25):
    import jax

    def run(k):
        out = None
        for _ in range(k):
            out = fn(*args)
        jax.block_until_ready(out)

    run(2)
    t0 = time.perf_counter(); run(lo)
    t1 = time.perf_counter(); run(hi)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (hi - lo) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from gstpu.config import RenderSettings
    from gstpu.ops import pallas_rasterize
    from gstpu.ops.binning import build_pairs, fill_by_offsets
    from gstpu.ops.preprocess import preprocess
    from tests.scenes import example_camera, random_scene

    jax.config.update("jax_compilation_cache_dir", "/tmp/gstpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    rng = np.random.default_rng(0)
    cam = example_camera(width=W, height=H)
    pts, shs, scales, rotations, opacities = random_scene(
        rng, n=N, extent=1.3, z_center=-10.0,
        opacity_range=(0.05, 0.9), scale_range=(0.01, 0.05))
    j = jnp.asarray
    means, scales, rotations, opacities, shs = (
        j(pts), j(scales), j(rotations), j(opacities), j(shs))
    view, proj, campos = j(cam["view"]), j(cam["proj"]), j(cam["campos"])
    settings = RenderSettings(width=W, height=H, pair_capacity=1 << 19,
                              tight_radius=True, use_pallas=True)
    _ = int(jnp.sum(means).astype(jnp.int32))  # poison stream

    prep = jax.jit(lambda *a: preprocess(
        *a, W, H, cam["tan_fovx"], cam["tan_fovy"], settings.grid_x,
        settings.grid_y, 3, tight_radius=True))(
            means, scales, rotations, opacities, shs, view, proj, campos)
    live = int(np.asarray(prep.tiles_touched).sum())
    cap = -(-int(live * 1.05) // 8192) * 8192
    import dataclasses
    settings = dataclasses.replace(settings, pair_capacity=cap)
    t = settings.band_tiles
    k = cap
    print(f"live={live} cap={cap} tiles={t}")

    pairs_fn = jax.jit(lambda tt, rect, d: build_pairs(
        tt, rect, d, settings.grid_x, t, cap))
    pairs = pairs_fn(prep.tiles_touched, prep.rect, prep.depth)

    # --- padded-volume statistics
    tc = np.asarray(pairs.tile_count)
    ts = np.asarray(pairs.tile_start)
    head = ts % 128
    span = np.where(tc > 0, head + tc, 0)
    for blk in (128, 256, 512):
        vol = (np.ceil(span / blk) * blk).sum()
        print(f"BLOCK={blk}: padded lanes={vol/1e6:.2f}M  ({vol/live:.2f}x live)"
              f"  loop-iters={int(np.ceil(span / blk).sum())}")
    print(f"tiles by count: <=64:{(tc<=64).sum()} <=192:{(tc<=192).sum()} "
          f"<=448:{(tc<=448).sum()} >448:{(tc>448).sum()} max={tc.max()}")

    # --- binning sub-stages
    cum = jnp.cumsum(prep.tiles_touched)
    f_sort3 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2,
                                                   is_stable=True))
    tile_r = jnp.asarray(np.random.randint(0, t, k), jnp.int32)
    db_r = jnp.asarray(np.random.randint(0, 2**30, k), jnp.int32)
    g_r = jnp.asarray(np.random.randint(0, N, k), jnp.int32)
    print(f"sort 2key+1rider @K:  {timeit(f_sort3, tile_r, db_r, g_r):7.2f} ms")
    f_sort4 = jax.jit(lambda a, b, c, d: jax.lax.sort(
        (a, b, c, d), num_keys=2, is_stable=True))
    print(f"sort 2key+2rider @K:  {timeit(f_sort4, tile_r, db_r, g_r, g_r):7.2f} ms")

    def scans(cum_):
        hits = jnp.zeros((k,), jnp.int32).at[cum_].add(1, mode="drop")
        seg = jnp.cumsum(hits)
        iota = jnp.arange(k, dtype=jnp.int32)
        is_start = hits > 0
        starts = jax.lax.cummax(jnp.where(is_start, iota, 0))
        return seg, starts
    print(f"binning scans @K:     {timeit(jax.jit(scans), cum):7.2f} ms")

    tbl4 = jnp.zeros((N, 4), jnp.int32)
    print(f"row gather (K,4):     {timeit(jax.jit(lambda tb, g: tb[g]), tbl4, g_r):7.2f} ms")
    f_ss = jax.jit(lambda ts_, tid: (
        jnp.searchsorted(ts_, tid, side='left'),
        jnp.searchsorted(ts_, tid, side='right')))
    tids = jnp.arange(t, dtype=jnp.int32)
    print(f"searchsorted 2x @T:   {timeit(f_ss, pairs.tile_id, tids):7.2f} ms")

    # --- feat build sub-stages
    f_feat = jax.jit(lambda p, pr: pallas_rasterize._build_feat(p, pr))
    print(f"feat total:           {timeit(f_feat, prep, pairs):7.2f} ms")
    tbl16 = jnp.zeros((N, 16), jnp.float32)
    f_g16 = jax.jit(lambda tb, g: tb[g])
    print(f"row gather (K,16):    {timeit(f_g16, tbl16, g_r):7.2f} ms")
    big = jnp.zeros((k, 16), jnp.float32)
    f_tp = jax.jit(lambda x: jnp.pad(x, ((0, 512), (0, 0))).T)
    print(f"pad+transpose (K,16): {timeit(f_tp, big):7.2f} ms")
    f_g16t = jax.jit(lambda tb, g: jnp.pad(tb[g], ((0, 512), (0, 0))).T)
    print(f"gather+pad+T fused:   {timeit(f_g16t, tbl16, g_r):7.2f} ms")

    # --- epilogue sub-stages
    pg = jnp.zeros((16, k + 512), jnp.float32)
    processed = jnp.zeros((t, 8, 128), jnp.int32)

    def epilogue(pair_grads, processed_, pr):
        pair_grads = pair_grads[:, :k]
        q = jnp.arange(k, dtype=jnp.int32)
        astart_t = pr.tile_start - pr.tile_start % 128
        astart_q = fill_by_offsets(pr.tile_start, astart_t, k)
        processed_q = fill_by_offsets(pr.tile_start, processed_[:, 0, 0], k)
        valid = (pr.tile_id < t) & (q - astart_q < processed_q)
        pair_grads = jnp.where(valid[None, :], pair_grads, 0.0).T
        gid = jnp.where(valid, pr.gauss_id, N)
        return jnp.zeros((N, 16), jnp.float32).at[gid].add(
            pair_grads, mode="drop")
    print(f"epilogue total:       {timeit(jax.jit(epilogue), pg, processed, pairs):7.2f} ms")

    pgT = jnp.zeros((k, 16), jnp.float32)
    f_scat = jax.jit(lambda x, g: jnp.zeros((N, 16), jnp.float32).at[g].add(
        x, mode="drop"))
    print(f"scatter-add @K rows:  {timeit(f_scat, pgT, g_r):7.2f} ms")

    gs = jnp.sort(g_r)
    print(f"scatter-add sortedid: {timeit(f_scat, pgT, gs):7.2f} ms")

    f_fill = jax.jit(lambda o, v: fill_by_offsets(o, v, k))
    print(f"fill_by_offsets @K:   {timeit(f_fill, pairs.tile_start, pairs.tile_start):7.2f} ms")

    f_maskT = jax.jit(lambda x, v: jnp.where(v[None, :], x, 0.0).T)
    vmask = jnp.ones((k,), bool)
    print(f"mask+transpose:       {timeit(f_maskT, pg[:, :k], vmask):7.2f} ms")

    # sorted-segment alternative: gather rows by perm then cumsum/gather
    perm = jnp.asarray(np.random.permutation(k), jnp.int32)
    f_pg = jax.jit(lambda x, p: x[p])
    print(f"perm row gather (K,16):{timeit(f_pg, pgT, perm):7.2f} ms")


if __name__ == "__main__":
    main()

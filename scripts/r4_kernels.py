#!/usr/bin/env python
"""Round-4 kernel isolation: time fwd/bwd pallas calls and epilogue
separately, plus fwd variants, at the bench scene."""

import dataclasses
import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gstpu.config import RenderSettings, TILE_PIXELS
    from gstpu.ops import pallas_rasterize as pr
    from gstpu.ops.binning import build_pairs
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
    _ = int(jnp.sum(means).astype(jnp.int32))

    prep = jax.jit(lambda *a: preprocess(
        *a, W, H, cam["tan_fovx"], cam["tan_fovy"], settings.grid_x,
        settings.grid_y, 3, tight_radius=True))(
            means, scales, rotations, opacities, shs, view, proj, campos)
    live = int(np.asarray(prep.tiles_touched).sum())
    cap = -(-int(live * 1.05) // 8192) * 8192
    settings = dataclasses.replace(settings, pair_capacity=cap)
    t = settings.band_tiles
    pairs = jax.jit(lambda tt, rect, d: build_pairs(
        tt, rect, d, settings.grid_x, t, cap))(
            prep.tiles_touched, prep.rect, prep.depth)
    layout = jax.jit(pr.prepare_layout)(prep, pairs)
    print(f"live={live} cap={cap}")
    nz = int((np.asarray(pairs.tile_count) > 0).sum())
    print(f"nonempty tiles={nz}")

    # --- fwd as-is
    f_fwd = jax.jit(lambda p, q, lo_: pr.composite_forward(
        p, q, settings, row0=0, layout=lo_))
    color, dacc, final_t, ncontrib = f_fwd(prep, pairs, layout)
    print(f"fwd as-is:        {timeit(f_fwd, prep, pairs, layout):7.2f} ms")

    # --- fwd pallas_call only (raw, no output unpack)
    row0_arr = jnp.zeros((1,), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 8, TILE_PIXELS), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, pr.FEAT_ROWS, pr.BLOCK), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))])
    f_raw = jax.jit(lambda ts_, tc_, r0, ft: pl.pallas_call(
        functools.partial(pr._fwd_kernel, settings.grid_x, 1),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, 8, TILE_PIXELS), jnp.float32))(
            ts_, tc_, r0, ft))
    print(f"fwd raw call:     {timeit(f_raw, pairs.tile_start, pairs.tile_count, row0_arr, layout):7.2f} ms")

    # --- fwd with empty tiles (fixed per-program cost)
    zc = jnp.zeros_like(pairs.tile_count)
    print(f"fwd all-empty:    {timeit(f_raw, pairs.tile_start, zc, row0_arr, layout):7.2f} ms")

    # --- bwd split: kernel call vs epilogue
    dl_dpix = jnp.ones((t, 256, 3), jnp.float32) / (H * W * 3)
    dl_dd = jnp.zeros((t, 256), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    f_bwd_full = jax.jit(lambda p, q, c, ft, da, lo_: pr.composite_backward(
        p, q, settings, c, ft, dl_dpix, bg, row0=0, layout=lo_,
        depth_acc=da, dl_ddepth=dl_dd))
    f_bwd_full(prep, pairs, color, final_t, dacc, layout)
    print(f"bwd full:         {timeit(f_bwd_full, prep, pairs, color, final_t, dacc, layout):7.2f} ms")

    # raw bwd pallas_call
    k_pad = layout.shape[1]
    ctot_dot = jnp.sum(color * dl_dpix, axis=-1) + dacc * dl_dd
    bg_dot = jnp.sum(bg[None, None, :] * dl_dpix, axis=-1)
    pix = jnp.stack([ctot_dot, bg_dot, final_t,
                     dl_dpix[:, :, 0], dl_dpix[:, :, 1], dl_dpix[:, :, 2],
                     dl_dd, jnp.zeros_like(final_t)], axis=1)
    grid_spec_b = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec((1, 8, TILE_PIXELS), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((2, pr.FEAT_ROWS, pr.BLOCK), jnp.float32),
                        pltpu.VMEM((2, pr.GRAD_ROWS, pr.BLOCK), jnp.float32),
                        pltpu.VMEM((pr.GRAD_ROWS, pr.CHUNK), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA(())])
    f_bwd_raw = jax.jit(lambda ts_, tc_, r0, ft, px: pl.pallas_call(
        functools.partial(pr._bwd_kernel, settings.grid_x, 1),
        grid_spec=grid_spec_b,
        out_shape=[jax.ShapeDtypeStruct((pr.GRAD_ROWS, k_pad), jnp.float32),
                   jax.ShapeDtypeStruct((t, 8, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(
            ts_, tc_, r0, ft, px))
    f_bwd_raw(pairs.tile_start, pairs.tile_count, row0_arr, layout, pix)
    print(f"bwd raw call:     {timeit(f_bwd_raw, pairs.tile_start, pairs.tile_count, row0_arr, layout, pix):7.2f} ms")


if __name__ == "__main__":
    main()

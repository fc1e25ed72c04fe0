"""Pallas TPU kernels for the rasterize hot loops.

Replaces the XLA compositing path (ops/rasterize.py) with per-tile kernels:

- grid = one program per 16x16 image tile (the reference's CUDA block,
  forward.py:844-846);
- per-pair data is pre-gathered once into a feature matrix in *sorted pair
  order* (struct-of-arrays, (16, K)), so each tile's Gaussians are a
  contiguous HBM slice [start, start+count) — DMA'd in chunks of 128 into
  VMEM;
- the front-to-back transmittance chain is computed exactly per chunk by a
  Hillis-Steele doubling cumulative product on the VPU (7 shift-multiplies
  per 128-pair chunk), and a per-tile ``while_loop`` walks only that tile's
  actual pair count with early exit once every pixel is opaque — unlike the
  XLA path, no tile pays for the deepest tile's chunk count;
- the backward kernel writes *per-pair* gradients to the tile's own slice of a
  (16, K) output (disjoint writes — no atomics, cf. backward.py:672-706),
  which are then segment-summed into per-Gaussian gradients outside.

Layout: compute arrays are (256 pixels x 128 pairs) f32 — sublanes x lanes —
so per-pair rows of the feature chunk broadcast along lanes naturally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gstpu.config import RenderSettings, TILE_PIXELS, TILE_X, TILE_Y
from gstpu.ops.binning import Pairs
from gstpu.ops.preprocess import PreprocessOut
from gstpu.ops.rasterize import ALPHA_MAX, ALPHA_MIN, T_EPS

CHUNK = 128
FEAT_ROWS = 16  # x, y, conic_a, conic_b, conic_c, opacity, r, g, b, inv_depth
GRAD_ROWS = 16  # dmean2d_x, dmean2d_y, dconic_a, dconic_b, dconic_c, dopac,
#                 dcolor_r, dcolor_g, dcolor_b


def _aligned_layout(pairs: Pairs, num_tiles: int):
    """Re-layout the sorted pair list so every tile starts 128-aligned.

    Mosaic requires provably lane-aligned dynamic slices; aligning each
    tile's range to CHUNK also makes every DMA a full-tile transfer.  Returns
    (aligned_start (T,), src (K',), valid (K',)) where K' = K + T*CHUNK
    (static) and src indexes the original sorted pair order.
    """
    count = pairs.tile_count
    k = pairs.gauss_id.shape[0]
    acount = ((count + CHUNK - 1) // CHUNK) * CHUNK
    cum_incl = jnp.cumsum(acount)
    astart = cum_incl - acount
    k_aligned = k + num_tiles * CHUNK
    q = jnp.arange(k_aligned, dtype=jnp.int32)
    tile = jnp.searchsorted(cum_incl, q, side="right").astype(jnp.int32)
    tile_c = jnp.minimum(tile, num_tiles - 1)
    within = q - astart[tile_c]
    src = pairs.tile_start[tile_c] + within
    valid = (tile < num_tiles) & (within < count[tile_c])
    src = jnp.clip(src, 0, k - 1)
    return astart.astype(jnp.int32), src, valid


def _build_feat(prep: PreprocessOut, pairs: Pairs, src, valid) -> jnp.ndarray:
    """Gather per-pair Gaussian features in aligned pair order -> (16, K')."""
    gid = jnp.where(valid, pairs.gauss_id[src], 0)
    inv_depth = 1.0 / jnp.where(prep.depth == 0.0, 1.0, prep.depth)
    rows = [prep.xy[gid, 0], prep.xy[gid, 1],
            prep.conic[gid, 0], prep.conic[gid, 1], prep.conic[gid, 2],
            jnp.where(valid, prep.opacity[gid], 0.0),
            prep.rgb[gid, 0], prep.rgb[gid, 1], prep.rgb[gid, 2],
            inv_depth[gid]]
    kp = gid.shape[0]
    feat = jnp.stack(rows, axis=0)
    return jnp.concatenate(
        [feat, jnp.zeros((FEAT_ROWS - len(rows), kp), jnp.float32)], axis=0)


def _pix_coords(tile_idx, row0, grid_x: int):
    """(256, 1) pixel-center coordinates of this tile."""
    ty = tile_idx // grid_x + row0
    tx = tile_idx % grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIXELS, 1), 0)
    lx = p % TILE_X
    ly = p // TILE_X
    pixf_x = (tx * TILE_X + lx).astype(jnp.float32)
    pixf_y = (ty * TILE_Y + ly).astype(jnp.float32)
    return pixf_x, pixf_y


def _chunk_alpha_vmem(feat, pixf_x, pixf_y, lane_valid):
    """Per-(pixel, pair) alpha for one VMEM chunk; returns intermediates."""
    x = feat[0:1, :]
    y = feat[1:2, :]
    ca = feat[2:3, :]
    cb = feat[3:4, :]
    cc = feat[4:5, :]
    op = feat[5:6, :]
    dx = x - pixf_x                    # (256, C)
    dy = y - pixf_y
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(ALPHA_MAX, op * g)
    indiv = lane_valid & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha_eff = jnp.where(indiv, alpha, 0.0)
    return alpha_eff, indiv, g, dx, dy, (ca, cb, cc), op


def _prefix_products(trans, alpha_eff, lanes):
    """Inclusive/exclusive transmittance within the chunk.

    Exact inclusive cumulative product of (1-α) along lanes via Hillis-Steele
    doubling (7 shift-multiplies for C=128) — plain f32 multiplies, no
    transcendentals, so the result matches the XLA path's ``jnp.cumprod``
    to f32 rounding.
    """
    prod = 1.0 - alpha_eff                             # (256, C)
    shift = 1
    while shift < CHUNK:
        rolled = pltpu.roll(prod, shift, axis=1)
        prod = prod * jnp.where(lanes >= shift, rolled, 1.0)
        shift *= 2
    p_incl = trans * prod
    t_ex = p_incl / (1.0 - alpha_eff)                  # 1-α >= 0.01
    return p_incl, t_ex


def _fwd_kernel(grid_x: int, tile_start, tile_count, row0_ref,
                feat_hbm, out_ref, feat_vmem, sem):
    t = pl.program_id(0)
    start = tile_start[t]
    count = tile_count[t]
    k = feat_hbm.shape[1]
    pixf_x, pixf_y = _pix_coords(t, row0_ref[0], grid_x)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def body(carry):
        (i, trans, racc, gacc, bacc, dacc, last) = carry
        s = pl.multiple_of(start + i * CHUNK, CHUNK)
        dma = pltpu.make_async_copy(feat_hbm.at[:, pl.ds(s, CHUNK)],
                                    feat_vmem, sem)
        dma.start()
        dma.wait()
        pos = i * CHUNK + lanes                           # (1, C)
        lane_valid = pos < count
        alpha_eff, indiv, _, _, _, _, _ = _chunk_alpha_vmem(
            feat_vmem[:, :], pixf_x, pixf_y, lane_valid)
        p_incl, t_ex = _prefix_products(trans, alpha_eff, lanes)
        kept = indiv & (p_incl >= T_EPS)
        w = jnp.where(kept, alpha_eff * t_ex, 0.0)        # (256, C)

        racc = racc + jnp.sum(w * feat_vmem[6:7, :], axis=1, keepdims=True)
        gacc = gacc + jnp.sum(w * feat_vmem[7:8, :], axis=1, keepdims=True)
        bacc = bacc + jnp.sum(w * feat_vmem[8:9, :], axis=1, keepdims=True)
        dacc = dacc + jnp.sum(w * feat_vmem[9:10, :], axis=1, keepdims=True)

        p_kept = jnp.where(kept, p_incl, jnp.inf)
        p_last = jnp.min(p_kept, axis=1, keepdims=True)
        trans = jnp.where(jnp.isfinite(p_last), p_last, trans)
        contrib = jnp.where(kept, pos + 1, 0)
        last = jnp.maximum(last, jnp.max(contrib, axis=1, keepdims=True))
        return (i + 1, trans, racc, gacc, bacc, dacc, last)

    def cond(carry):
        i, trans = carry[0], carry[1]
        return (i * CHUNK < count) & (jnp.max(trans) >= T_EPS)

    zeros = jnp.zeros((TILE_PIXELS, 1), jnp.float32)
    init = (jnp.int32(0), jnp.ones((TILE_PIXELS, 1), jnp.float32),
            zeros, zeros, zeros, zeros,
            jnp.zeros((TILE_PIXELS, 1), jnp.int32))
    (_, trans, racc, gacc, bacc, dacc, last) = jax.lax.while_loop(
        cond, body, init)
    # pack results as rows of the (1, 8, 256) output block; n_contrib rides
    # as bitcast float bits (exact int32 round trip)
    out_ref[0, 0, :] = racc[:, 0]
    out_ref[0, 1, :] = gacc[:, 0]
    out_ref[0, 2, :] = bacc[:, 0]
    out_ref[0, 3, :] = dacc[:, 0]
    out_ref[0, 4, :] = trans[:, 0]
    out_ref[0, 5, :] = pltpu.bitcast(last, jnp.float32)[:, 0]
    out_ref[0, 6, :] = jnp.zeros((TILE_PIXELS,), jnp.float32)
    out_ref[0, 7, :] = jnp.zeros((TILE_PIXELS,), jnp.float32)


def composite_forward(prep: PreprocessOut, pairs: Pairs,
                      settings: RenderSettings, row0=0, interpret=False):
    """Pallas forward compositing; same contract as rasterize.composite_forward."""
    t = settings.band_tiles
    astart, src, valid = _aligned_layout(pairs, t)
    feat = _build_feat(prep, pairs, src, valid)
    row0_arr = jnp.asarray(row0, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 8, TILE_PIXELS), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((FEAT_ROWS, CHUNK), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    packed = pl.pallas_call(
        functools.partial(_fwd_kernel, settings.grid_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, 8, TILE_PIXELS), jnp.float32),
        interpret=interpret,
    )(astart, pairs.tile_count, row0_arr, feat)
    color = jnp.stack([packed[:, 0], packed[:, 1], packed[:, 2]], axis=-1)
    d = packed[:, 3]
    final_t = packed[:, 4]
    n_contrib = jax.lax.bitcast_convert_type(packed[:, 5], jnp.int32)
    return color, d, final_t, n_contrib


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_kernel(grid_x: int, tile_start, tile_count, row0_ref,
                feat_hbm, pix_in, grads_hbm,
                feat_vmem, grad_vmem, sem_in, sem_out):
    t = pl.program_id(0)
    start = tile_start[t]
    count = tile_count[t]
    k = feat_hbm.shape[1]
    pixf_x, pixf_y = _pix_coords(t, row0_ref[0], grid_x)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    # per-pixel quantities of this tile, as (256, 1) columns
    ctot_dot = pix_in[0, 0, :].reshape(TILE_PIXELS, 1)
    bg_dot = pix_in[0, 1, :].reshape(TILE_PIXELS, 1)
    final_t = pix_in[0, 2, :].reshape(TILE_PIXELS, 1)
    ct_r = pix_in[0, 3, :].reshape(TILE_PIXELS, 1)
    ct_g = pix_in[0, 4, :].reshape(TILE_PIXELS, 1)
    ct_b = pix_in[0, 5, :].reshape(TILE_PIXELS, 1)

    def body(carry):
        (i, trans, prefix_u) = carry
        s = pl.multiple_of(start + i * CHUNK, CHUNK)
        dma = pltpu.make_async_copy(feat_hbm.at[:, pl.ds(s, CHUNK)],
                                    feat_vmem, sem_in)
        dma.start()
        dma.wait()
        pos = i * CHUNK + lanes
        lane_valid = pos < count
        alpha_eff, indiv, g, dx, dy, (ca, cb, cc), op = _chunk_alpha_vmem(
            feat_vmem[:, :], pixf_x, pixf_y, lane_valid)
        p_incl, t_ex = _prefix_products(trans, alpha_eff, lanes)
        kept = indiv & (p_incl >= T_EPS)
        w = jnp.where(kept, alpha_eff * t_ex, 0.0)

        col_r = feat_vmem[6:7, :]
        col_g = feat_vmem[7:8, :]
        col_b = feat_vmem[8:9, :]
        cdot = col_r * ct_r + col_g * ct_g + col_b * ct_b   # (256, C)
        u = w * cdot
        # inclusive prefix sum along lanes (Hillis-Steele doubling)
        cum_u = u
        shift = 1
        while shift < CHUNK:
            rolled = pltpu.roll(cum_u, shift, axis=1)
            cum_u = cum_u + jnp.where(lanes >= shift, rolled, 0.0)
            shift *= 2
        prefix_u_incl = prefix_u + cum_u
        inv_one_m = 1.0 / (1.0 - alpha_eff)
        dl_dalpha = (cdot * t_ex
                     - (ctot_dot - prefix_u_incl) * inv_one_m
                     - (final_t * inv_one_m) * bg_dot)
        dl_dalpha = jnp.where(kept, dl_dalpha, 0.0)

        dl_dg = op * dl_dalpha
        gdx = g * dx
        gdy = g * dy
        dg_ddelx = -gdx * ca - gdy * cb
        dg_ddely = -gdy * cc - gdx * cb
        # per-pair sums over the 256 pixels (sublane reductions)
        grad_vmem[0, :] = jnp.sum(dl_dg * dg_ddelx, axis=0)
        grad_vmem[1, :] = jnp.sum(dl_dg * dg_ddely, axis=0)
        grad_vmem[2, :] = jnp.sum(-0.5 * gdx * dx * dl_dg, axis=0)
        grad_vmem[3, :] = jnp.sum(-0.5 * gdx * dy * dl_dg, axis=0)
        grad_vmem[4, :] = jnp.sum(-0.5 * gdy * dy * dl_dg, axis=0)
        grad_vmem[5, :] = jnp.sum(jnp.where(kept, g, 0.0) * dl_dalpha, axis=0)
        grad_vmem[6, :] = jnp.sum(w * ct_r, axis=0)
        grad_vmem[7, :] = jnp.sum(w * ct_g, axis=0)
        grad_vmem[8, :] = jnp.sum(w * ct_b, axis=0)
        grad_vmem[9:, :] = jnp.zeros((GRAD_ROWS - 9, CHUNK), jnp.float32)

        # write this chunk's per-pair grads to the tile's disjoint slice
        out_dma = pltpu.make_async_copy(grad_vmem,
                                        grads_hbm.at[:, pl.ds(s, CHUNK)],
                                        sem_out)
        out_dma.start()
        out_dma.wait()

        p_kept = jnp.where(kept, p_incl, jnp.inf)
        p_last = jnp.min(p_kept, axis=1, keepdims=True)
        trans = jnp.where(jnp.isfinite(p_last), p_last, trans)
        prefix_u = prefix_u + jnp.sum(u, axis=1, keepdims=True)
        return (i + 1, trans, prefix_u)

    def cond(carry):
        i, trans = carry[0], carry[1]
        return (i * CHUNK < count) & (jnp.max(trans) >= T_EPS)

    init = (jnp.int32(0), jnp.ones((TILE_PIXELS, 1), jnp.float32),
            jnp.zeros((TILE_PIXELS, 1), jnp.float32))
    (i_end, _, _) = jax.lax.while_loop(cond, body, init)

    # Early exit may leave this tile's remaining pair slots unwritten in the
    # ANY-space output; zero-fill them (the XLA path's kept-mask equivalent).
    n_chunks = (count + CHUNK - 1) // CHUNK

    def zero_body(i):
        grad_vmem[:, :] = jnp.zeros((GRAD_ROWS, CHUNK), jnp.float32)
        out_dma = pltpu.make_async_copy(
            grad_vmem,
            grads_hbm.at[:, pl.ds(pl.multiple_of(start + i * CHUNK, CHUNK),
                                  CHUNK)],
            sem_out)
        out_dma.start()
        out_dma.wait()
        return i + 1

    jax.lax.while_loop(lambda i: i < n_chunks, zero_body, i_end)


def composite_backward(prep: PreprocessOut, pairs: Pairs,
                       settings: RenderSettings,
                       color_pre_bg, final_t, dl_dpix, bg, row0=0,
                       interpret=False):
    """Pallas backward; same contract as rasterize.composite_backward."""
    n = prep.xy.shape[0]
    t = settings.band_tiles
    astart, src, valid = _aligned_layout(pairs, t)
    feat = _build_feat(prep, pairs, src, valid)
    k_aligned = feat.shape[1]
    row0_arr = jnp.asarray(row0, jnp.int32).reshape(1)

    ctot_dot = jnp.sum(color_pre_bg * dl_dpix, axis=-1)       # (T, P)
    bg_dot = jnp.sum(bg[None, None, :] * dl_dpix, axis=-1)    # (T, P)
    pix = jnp.stack([ctot_dot, bg_dot, final_t,
                     dl_dpix[:, :, 0], dl_dpix[:, :, 1], dl_dpix[:, :, 2],
                     jnp.zeros_like(final_t), jnp.zeros_like(final_t)],
                    axis=1)                                    # (T, 8, P)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec((1, 8, TILE_PIXELS), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.VMEM((FEAT_ROWS, CHUNK), jnp.float32),
                        pltpu.VMEM((GRAD_ROWS, CHUNK), jnp.float32),
                        pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
    )
    pair_grads = pl.pallas_call(
        functools.partial(_bwd_kernel, settings.grid_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((GRAD_ROWS, k_aligned), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(astart, pairs.tile_count, row0_arr, feat, pix)

    # slots past a tile's true count (alignment padding) and past the last
    # tile's aligned end are either zero-filled by the kernel or invalid —
    # mask both out of the segment sum.
    pair_grads = jnp.where(valid[None, :], pair_grads, 0.0)
    gid = jnp.where(valid, pairs.gauss_id[src], n)
    ddelx_dx = 0.5 * settings.width
    ddely_dy = 0.5 * settings.height

    def seg(row):
        return jnp.zeros((n,), jnp.float32).at[gid].add(row, mode="drop")

    d_mean2d = jnp.stack([seg(pair_grads[0] * ddelx_dx),
                          seg(pair_grads[1] * ddely_dy)], axis=-1)
    d_conic = jnp.stack([seg(pair_grads[2]), seg(pair_grads[3]),
                         seg(pair_grads[4])], axis=-1)
    d_opac = seg(pair_grads[5])
    d_color = jnp.stack([seg(pair_grads[6]), seg(pair_grads[7]),
                         seg(pair_grads[8])], axis=-1)
    return d_color, d_mean2d, d_conic, d_opac

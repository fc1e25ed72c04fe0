"""Pallas TPU kernels for the rasterize hot loops.

Replaces the XLA compositing path (ops/rasterize.py) with per-tile kernels:

- grid = one program per 16x16 image tile (the reference's CUDA block,
  forward.py:844-846);
- per-pair data is pre-gathered once into a feature matrix in *sorted pair
  order* (struct-of-arrays, (16, K)), so each tile's Gaussians are a
  contiguous HBM slice [start, start+count) — DMA'd into VMEM from the
  floor-aligned chunk base ``start - start % 128`` (Mosaic needs lane-aligned
  slices); the up-to-127 leading ``head`` lanes belong to the previous tile
  and are masked in-kernel.  Rounds 1-2 instead re-laid the pair list out so
  every tile started 128-aligned — that cost four K'-sized scans, a second
  row gather, and grew every downstream stage to K' = K + slack; all of
  that is gone;
- the front-to-back transmittance chain is computed exactly per chunk by a
  Hillis-Steele doubling cumulative product on the VPU (7 shift-multiplies
  per 128-pair chunk), and a per-tile ``while_loop`` walks only that tile's
  actual pair count with early exit once every pixel is opaque — unlike the
  XLA path, no tile pays for the deepest tile's chunk count;
- the backward kernel writes *per-pair* gradients to the tile's own slice of
  a (16, K) output in sorted order (no atomics, cf. backward.py:672-706;
  boundary chunks shared with the previous tile are merged by a read-select
  — race-free because grid steps run sequentially), then ONE masked row
  scatter-add segment-sums them into per-Gaussian gradients outside.

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
# Chunks per DMA transfer.  Measured on the attached chip: each in-kernel DMA
# start+wait costs ~1.5 us of scalar-core overhead while a 128-pair chunk's
# vector math costs ~1.3 us — a chunk-granular pipeline spends HALF the
# kernel on DMA machinery (the round-1 kernels did; a no-DMA variant of the
# same body hit the SOL.json compositing floor exactly).  Block transfers
# amortize the fixed DMA cost 4x; compute stays chunk-granular (static
# sub-slices), so the only cost is rounding small tiles up to BLOCK pairs.
BLOCK_CHUNKS = 4
BLOCK = BLOCK_CHUNKS * CHUNK
FEAT_ROWS = 16  # x, y, conic_a, conic_b, conic_c, opacity, r, g, b, inv_depth
GRAD_ROWS = 16  # dmean2d_x, dmean2d_y, dconic_a, dconic_b, dconic_c, dopac,
#                 dcolor_r, dcolor_g, dcolor_b


def _build_feat(prep: PreprocessOut, pairs: Pairs) -> jnp.ndarray:
    """Gather per-pair Gaussian features in SORTED pair order -> (16, K+BLOCK).

    ONE row gather (scalar gathers are ~25x costlier per element on TPU):
    gauss id -> packed (N, 16) table.  The kernels consume the sorted order
    directly (no 128-aligned re-layout: DMAs read from the floor-aligned
    chunk base of each tile's range and the head lanes are masked in-kernel),
    so the round-2 aligned-layout machinery — four K'-sized scans, a second
    K'-sized row gather, the aligned_slack_tiles capacity and its overflow
    contract — is gone, and every downstream stage (the grad DMA, masking,
    and the epilogue scatter-add) runs at the exact live-pair size K.
    The BLOCK zero-pad keeps the last tile's final block DMA in bounds.
    """
    inv_depth = 1.0 / jnp.where(prep.depth == 0.0, 1.0, prep.depth)
    n = prep.xy.shape[0]
    table = jnp.concatenate([
        prep.xy,                                     # 0, 1
        prep.conic,                                  # 2, 3, 4
        prep.opacity[:, None],                       # 5
        prep.rgb,                                    # 6, 7, 8
        inv_depth[:, None],                          # 9
        jnp.zeros((n, FEAT_ROWS - 10), jnp.float32)], axis=-1)
    feat = table[pairs.gauss_id]                     # (K, 16) row gather
    feat = jnp.pad(feat, ((0, BLOCK), (0, 0)))
    return feat.T


def _pix_coords(tile_idx, row0, grid_x: int, row_stride: int = 1):
    """(256, 1) pixel-center coordinates of this tile (strided band rows)."""
    ty = (tile_idx // grid_x) * row_stride + row0
    tx = tile_idx % grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIXELS, 1), 0)
    lx = p % TILE_X
    ly = p // TILE_X
    pixf_x = (tx * TILE_X + lx).astype(jnp.float32)
    pixf_y = (ty * TILE_Y + ly).astype(jnp.float32)
    return pixf_x, pixf_y


def _feat_row(feat, i: int, lane_valid):
    """Load one (1, C) feature row with invalid lanes zeroed.

    Invalid lanes hold garbage (stale or never-DMA'd VMEM); zeroing at load
    keeps every downstream product finite — masking only the *results* is not
    enough because 0 * NaN = NaN would poison the deferred accumulators.
    """
    return jnp.where(lane_valid, feat[i:i + 1, :], 0.0)


def _chunk_alpha_vmem(feat, pixf_x, pixf_y, lane_valid):
    """Per-(pixel, pair) alpha for one VMEM chunk; returns intermediates."""
    x = _feat_row(feat, 0, lane_valid)
    y = _feat_row(feat, 1, lane_valid)
    ca = _feat_row(feat, 2, lane_valid)
    cb = _feat_row(feat, 3, lane_valid)
    cc = _feat_row(feat, 4, lane_valid)
    op = _feat_row(feat, 5, lane_valid)
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


def _feat_dma(feat_hbm, feat_vmem, sem, astart, b, slot: int):
    """Descriptor for the block-b feature DMA into static slot ``slot``.

    ``astart`` is the tile's floor-aligned chunk base
    (tile_start - tile_start % CHUNK): the kernels read the SORTED pair list
    in place, so the first up-to-127 lanes of block 0 (``head``) belong to
    the previous tile and are masked off by ``lane_valid``.
    """
    s = pl.multiple_of(astart + b * BLOCK, CHUNK)
    return pltpu.make_async_copy(feat_hbm.at[:, pl.ds(s, BLOCK)],
                                 feat_vmem.at[slot], sem.at[slot])


def _fwd_kernel(grid_x: int, row_stride: int, tile_start, tile_count,
                row0_ref, feat_hbm, out_ref, feat_vmem, acc_vmem, td_vmem,
                last_vmem, sem):
    """Forward compositing, one 16x16 tile per grid step.

    The while loop advances one CHUNK per iteration; DMA stays BLOCK-granular
    (waits at the block's first chunk, prefetch of block+2 after its last),
    with the VMEM slot selected by block parity: DMA waits/starts sit in
    pl.when branches with STATIC slot indices, and the feature block is a
    vector select over both slots (reading the inactive, possibly mid-DMA
    slot is safe — its lanes are discarded).

    Chunk-granular control flow (round 5) exists for the trained-scene
    regime: with every tile occupied at ~300 pairs, the round-4 BLOCK-
    granular loop always ran all 4 chunks (the dead ones all-masked but
    paying full VPU cost) — the span cond now stops at the live chunk
    count, and the early-exit check runs 4x as often.  The chunk index
    within the block is traced, so compute dispatches through a 4-way
    static ``pl.when`` ladder (Mosaic has no value-returning conditional;
    round 3's lax.cond attempt failed to legalize) — which forces the
    accumulators out of the while carry into VMEM scratch:

    - ``acc_vmem`` (4, 256, C): color r/g/b + inverse-depth, accumulated
      in-place per chunk and lane-reduced ONCE after the loop;
    - ``td_vmem`` (2, 256, C): transmittance and done-flag, kept
      lane-REPLICATED so the per-chunk read needs no narrow (256, 1)
      VMEM access (done rides as f32 0/1 — Mosaic cannot legalize
      vector<i1> carries/stores);
    - ``last_vmem`` (256, C) int32: last-contributor position.

    Dead lanes are still maskable garbage: every per-pair term is gated by
    ``lane_valid``, which also covers never-DMA'd stale VMEM.
    """
    t = pl.program_id(0)
    start = tile_start[t]
    count = tile_count[t]
    head = start % CHUNK
    astart = start - head
    # span of the tile's floor-aligned read window; 0 for empty tiles so the
    # loop cond can never outrun the count>0-gated DMA starts
    span = jnp.where(count > 0, head + count, 0)
    pixf_x, pixf_y = _pix_coords(t, row0_ref[0], grid_x, row_stride)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    # Empty tiles skip EVERYTHING below: initializing + final-reducing the
    # (256, CHUNK) accumulators costs ~3.5 us/tile even with zero pairs
    # (measured round 4: 8.8 of the fwd kernel's 9.7 ms at the bench scene,
    # where only 143/2500 tiles are nonempty).  A no-result scf.if (pl.when)
    # legalizes fine on real TPUs, unlike a value-returning lax.cond.
    @pl.when(count == 0)
    def _():
        zero = jnp.zeros((TILE_PIXELS,), jnp.float32)
        out_ref[0, 0, :] = zero
        out_ref[0, 1, :] = zero
        out_ref[0, 2, :] = zero
        out_ref[0, 3, :] = zero
        out_ref[0, 4, :] = jnp.ones((TILE_PIXELS,), jnp.float32)
        out_ref[0, 5, :] = zero          # n_contrib 0 bitcasts to f32 0.0
        out_ref[0, 6, :] = zero
        out_ref[0, 7, :] = zero

    @pl.when(count > 0)
    def _nonempty():
        _feat_dma(feat_hbm, feat_vmem, sem, astart, 0, 0).start()

        @pl.when(BLOCK < span)
        def _():
            _feat_dma(feat_hbm, feat_vmem, sem, astart, 1, 1).start()

        acc_vmem[...] = jnp.zeros((4, TILE_PIXELS, CHUNK), jnp.float32)
        td_vmem[0] = jnp.ones((TILE_PIXELS, CHUNK), jnp.float32)
        td_vmem[1] = jnp.zeros((TILE_PIXELS, CHUNK), jnp.float32)
        last_vmem[...] = jnp.zeros((TILE_PIXELS, CHUNK), jnp.int32)

        def one_chunk(feat, c):
            """Composite one chunk from a (FEAT_ROWS, CHUNK) slice, reading
            and writing the scratch accumulators in place."""
            trans = td_vmem[0]                               # lane-replicated
            done = td_vmem[1]
            pos = c * CHUNK + lanes - head                   # (1, C) in-tile idx
            lane_valid = (pos >= 0) & (pos < count)
            alpha_eff, indiv, _, _, _, _, _ = _chunk_alpha_vmem(
                feat, pixf_x, pixf_y, lane_valid)
            p_incl, t_ex = _prefix_products(trans, alpha_eff, lanes)
            kept = indiv & (p_incl >= T_EPS) & (done == 0.0)
            w = jnp.where(kept, alpha_eff * t_ex, 0.0)       # (256, C)

            acc_vmem[0] += w * _feat_row(feat, 6, lane_valid)
            acc_vmem[1] += w * _feat_row(feat, 7, lane_valid)
            acc_vmem[2] += w * _feat_row(feat, 8, lane_valid)
            acc_vmem[3] += w * _feat_row(feat, 9, lane_valid)
            last_vmem[...] = jnp.maximum(last_vmem[...],
                                         jnp.where(kept, pos + 1, 0))

            p_kept = jnp.where(kept, p_incl, jnp.inf)
            p_last = jnp.min(p_kept, axis=1, keepdims=True)
            td_vmem[0] = jnp.where(jnp.isfinite(p_last),
                                   jnp.broadcast_to(p_last,
                                                    (TILE_PIXELS, CHUNK)),
                                   trans)
            # the reference BREAKS the pixel at the first passing Gaussian
            # whose would-be transmittance crosses below 1e-4
            # (forward.py:486-488); once every pixel is done the loop exits
            td_vmem[1] = jnp.maximum(done, jnp.broadcast_to(jnp.any(
                indiv & (p_incl < T_EPS), axis=1, keepdims=True
            ).astype(jnp.float32), (TILE_PIXELS, CHUNK)))

        def body(carry):
            c = carry[0]
            blk = c // BLOCK_CHUNKS
            u = c % BLOCK_CHUNKS
            even = blk % 2 == 0

            # the wait descriptor must match the start descriptor exactly
            # (same astart base) — the semaphore decrement is shape-derived,
            # but the address is a pl.multiple_of hint to Mosaic and must hold
            @pl.when((u == 0) & even)
            def _():
                _feat_dma(feat_hbm, feat_vmem, sem, astart, blk, 0).wait()

            @pl.when((u == 0) & jnp.logical_not(even))
            def _():
                _feat_dma(feat_hbm, feat_vmem, sem, astart, blk, 1).wait()

            feat_blk = jnp.where(even, feat_vmem[0], feat_vmem[1])
            for us in range(BLOCK_CHUNKS):
                # the in-block chunk index is traced: dispatch to the static
                # sub-slice through a no-result pl.when ladder
                @pl.when(u == us)
                def _(us=us):
                    one_chunk(feat_blk[:, us * CHUNK:(us + 1) * CHUNK],
                              blk * BLOCK_CHUNKS + us)

            # after the block's last chunk the consumed slot is free:
            # prefetch block blk+2 into it (same parity slot)
            last_u = u == BLOCK_CHUNKS - 1

            @pl.when(last_u & even & ((blk + 2) * BLOCK < span))
            def _():
                _feat_dma(feat_hbm, feat_vmem, sem, astart, blk + 2, 0).start()

            @pl.when(last_u & jnp.logical_not(even)
                     & ((blk + 2) * BLOCK < span))
            def _():
                _feat_dma(feat_hbm, feat_vmem, sem, astart, blk + 2, 1).start()

            stop = jnp.min(td_vmem[1])
            return (c + 1, stop)

        def cond(carry):
            c, stop = carry
            return (c * CHUNK < span) & (stop == 0.0)

        (c_end, _) = jax.lax.while_loop(cond, body,
                                        (jnp.int32(0), jnp.float32(0.0)))

        # Drain un-waited DMAs so slot reuse stays safe.  Waits run at each
        # block's FIRST chunk, so after exiting at chunk c_end:
        # - block blk_end is un-waited iff the exit landed exactly on its
        #   first chunk (u_end == 0) and it was started (blk_end*BLOCK<span);
        # - block blk_end+1 was started (initially or by prefetch — both
        #   conditions reduce to (blk_end+1)*BLOCK < span) and never waited.
        # No deeper block can be in flight: prefetch of blk+2 happens at
        # blk's last chunk, which the loop has not passed.
        blk_end = c_end // BLOCK_CHUNKS
        u_end = c_end % BLOCK_CHUNKS
        even_end = blk_end % 2 == 0
        w0 = (u_end == 0) & (blk_end * BLOCK < span)

        @pl.when(w0 & even_end)
        def _():
            _feat_dma(feat_hbm, feat_vmem, sem, astart, blk_end, 0).wait()

        @pl.when(w0 & jnp.logical_not(even_end))
        def _():
            _feat_dma(feat_hbm, feat_vmem, sem, astart, blk_end, 1).wait()

        w1 = (blk_end + 1) * BLOCK < span

        @pl.when(w1 & even_end)
        def _():
            _feat_dma(feat_hbm, feat_vmem, sem, astart, blk_end + 1, 1).wait()

        @pl.when(w1 & jnp.logical_not(even_end))
        def _():
            _feat_dma(feat_hbm, feat_vmem, sem, astart, blk_end + 1, 0).wait()

        # pack results as rows of the (1, 8, 256) output block; n_contrib rides
        # as bitcast float bits (exact int32 round trip)
        out_ref[0, 0, :] = jnp.sum(acc_vmem[0], axis=1)
        out_ref[0, 1, :] = jnp.sum(acc_vmem[1], axis=1)
        out_ref[0, 2, :] = jnp.sum(acc_vmem[2], axis=1)
        out_ref[0, 3, :] = jnp.sum(acc_vmem[3], axis=1)
        out_ref[0, 4, :] = jnp.min(td_vmem[0], axis=1)   # lane-replicated
        out_ref[0, 5, :] = pltpu.bitcast(
            jnp.max(last_vmem[...], axis=1, keepdims=True), jnp.float32)[:, 0]
        out_ref[0, 6, :] = jnp.zeros((TILE_PIXELS,), jnp.float32)
        out_ref[0, 7, :] = jnp.zeros((TILE_PIXELS,), jnp.float32)


def prepare_layout(prep: PreprocessOut, pairs: Pairs, num_tiles: int = 0):
    """Sorted-order feature matrix, shared between forward and backward.

    The render custom-VJP stashes this in its residuals so the backward pass
    does not rebuild the (16, K+BLOCK) feature matrix.  (Rounds 1-2 also
    built a 128-aligned pair re-layout here; the kernels now read the sorted
    list in place from floor-aligned DMA bases, so the feature matrix IS the
    whole layout.)
    """
    del num_tiles
    return _build_feat(prep, pairs)


def composite_forward(prep: PreprocessOut, pairs: Pairs,
                      settings: RenderSettings, row0=0, interpret=False,
                      layout=None):
    """Pallas forward compositing; same contract as rasterize.composite_forward."""
    t = settings.band_tiles
    feat = layout if layout is not None else prepare_layout(prep, pairs)
    row0_arr = jnp.asarray(row0, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 8, TILE_PIXELS), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, FEAT_ROWS, BLOCK), jnp.float32),
                        pltpu.VMEM((4, TILE_PIXELS, CHUNK), jnp.float32),
                        pltpu.VMEM((2, TILE_PIXELS, CHUNK), jnp.float32),
                        pltpu.VMEM((TILE_PIXELS, CHUNK), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    packed = pl.pallas_call(
        functools.partial(_fwd_kernel, settings.grid_x, settings.row_stride),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, 8, TILE_PIXELS), jnp.float32),
        interpret=interpret,
    )(pairs.tile_start, pairs.tile_count, row0_arr, feat)
    color = jnp.stack([packed[:, 0], packed[:, 1], packed[:, 2]], axis=-1)
    d = packed[:, 3]
    final_t = packed[:, 4]
    n_contrib = jax.lax.bitcast_convert_type(packed[:, 5], jnp.int32)
    return color, d, final_t, n_contrib


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

_CUMSUM_BLOCK = 512


def _inclusive_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum of (K, C) f32 along axis 0, MXU-blocked on TPU.

    On TPU, XLA's flat ``jnp.cumsum`` over (425k, 16) costs ~0.97 ms; the
    same scan as per-block triangular matmuls on the systolic array (intra-
    block prefix sums = tri(B,B) @ block, then a tiny coarse cumsum of block
    totals) costs ~0.21 ms (scripts/r5_segsum.py).  Per-block reassociation
    shifts sums by ~1e-4 relative at K=425k — within the compiled parity
    gate's 1e-3 grad threshold but above the 1e-5 the CPU interpret-mode
    tests pin the epilogue to, so non-TPU backends keep the flat scan
    (bit-identical to the XLA path's addition order).
    """
    if jax.default_backend() != "tpu":
        return jnp.cumsum(x, axis=0)
    k, c = x.shape
    b = _CUMSUM_BLOCK
    kp = -(-k // b) * b
    xb = jnp.pad(x, ((0, kp - k), (0, 0))).reshape(kp // b, b, c)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    tri = (rows_i <= cols_i).astype(jnp.float32)
    intra = jax.lax.dot_general(                 # intra[j, blk, c]
        tri, xb, (((0,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    intra = jnp.moveaxis(intra, 0, 1)            # (blocks, b, c)
    coarse = jnp.cumsum(intra[:, -1], axis=0) - intra[:, -1]
    return (intra + coarse[:, None, :]).reshape(kp, c)[:k]

def _bwd_kernel(grid_x: int, row_stride: int, tile_start, tile_count,
                row0_ref, feat_hbm, pix_in, grads_hbm, processed_ref,
                feat_vmem, grad_vmem, merge_vmem, tdp_vmem, sem_in, sem_out,
                sem_mrg):
    """Backward compositing; same block-granular parity pipeline as the
    forward, with a second ping-pong DMA pipeline draining per-pair gradient
    BLOCKs back to HBM.  The output is in SORTED pair order, so this tile's
    write window [astart, astart + blocks*BLOCK) overlaps neighbours at the
    boundary chunks: the up-to-127 ``head`` lanes of chunk 0 hold the
    PREVIOUS tile's already-written gradients and are merged back via a
    read-select (race-free — grid steps run sequentially and the previous
    step drained its out-DMAs); lanes past this tile's count get garbage
    that the NEXT tile (or the epilogue's validity mask) overwrites.
    No atomics anywhere."""
    t = pl.program_id(0)
    start = tile_start[t]
    count = tile_count[t]
    head = start % CHUNK
    astart = start - head
    span = jnp.where(count > 0, head + count, 0)
    pixf_x, pixf_y = _pix_coords(t, row0_ref[0], grid_x, row_stride)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def merge_dma():
        s = pl.multiple_of(astart, CHUNK)
        return pltpu.make_async_copy(grads_hbm.at[:, pl.ds(s, CHUNK)],
                                     merge_vmem, sem_mrg)

    def out_dma(b, slot: int):
        s = pl.multiple_of(astart + b * BLOCK, CHUNK)
        return pltpu.make_async_copy(grad_vmem.at[slot],
                                     grads_hbm.at[:, pl.ds(s, BLOCK)],
                                     sem_out.at[slot])

    # Empty tiles skip everything except the processed count (same fixed
    # per-tile cost finding as the forward kernel; the grads_hbm slice stays
    # untouched — it is ANY-space garbage the epilogue's validity mask drops).
    @pl.when(count == 0)
    def _():
        processed_ref[0, :, :] = jnp.zeros((8, 128), jnp.int32)

    @pl.when(count > 0)
    def _nonempty():
        @pl.when(head > 0)
        def _():
            merge_dma().start()

        # per-pixel quantities of this tile, as (256, 1) columns
        ctot_dot = pix_in[0, 0, :].reshape(TILE_PIXELS, 1)
        bg_dot = pix_in[0, 1, :].reshape(TILE_PIXELS, 1)
        final_t = pix_in[0, 2, :].reshape(TILE_PIXELS, 1)
        ct_r = pix_in[0, 3, :].reshape(TILE_PIXELS, 1)
        ct_g = pix_in[0, 4, :].reshape(TILE_PIXELS, 1)
        ct_b = pix_in[0, 5, :].reshape(TILE_PIXELS, 1)
        ct_d = pix_in[0, 6, :].reshape(TILE_PIXELS, 1)   # depth cotangent

        _feat_dma(feat_hbm, feat_vmem, sem_in, astart, 0, 0).start()

        @pl.when(BLOCK < span)
        def _():
            _feat_dma(feat_hbm, feat_vmem, sem_in, astart, 1, 1).start()

        def one_chunk(feat, c):
            """Gradient rows for one chunk; stale-data safe (all terms masked
            by lane_valid).  Reads/updates trans, done, and the running
            prefix in ``tdp_vmem`` scratch (lane-replicated — the chunk
            compute now sits inside a liveness ``pl.when``, which cannot
            return values; done rides as f32 0/1 since Mosaic cannot
            legalize vector<i1> stores).  Returns the grad rows tuple."""
            trans = tdp_vmem[0]
            done = tdp_vmem[1]
            prefix_u = tdp_vmem[2]
            pos = c * CHUNK + lanes - head
            lane_valid = (pos >= 0) & (pos < count)
            alpha_eff, indiv, g, dx, dy, (ca, cb, cc), op = _chunk_alpha_vmem(
                feat, pixf_x, pixf_y, lane_valid)
            p_incl, t_ex = _prefix_products(trans, alpha_eff, lanes)
            kept = indiv & (p_incl >= T_EPS) & (done == 0.0)
            w = jnp.where(kept, alpha_eff * t_ex, 0.0)

            cdot = (_feat_row(feat, 6, lane_valid) * ct_r
                    + _feat_row(feat, 7, lane_valid) * ct_g
                    + _feat_row(feat, 8, lane_valid) * ct_b
                    + _feat_row(feat, 9, lane_valid) * ct_d)    # (256, C)
            u = w * cdot
            # inclusive prefix sum along lanes as ONE MXU matmul against a
            # lower-triangular ones matrix — log2(C) VPU roll passes cost far more
            # than a (256,C)x(C,C) matmul on the systolic array
            rows_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
            cols_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
            tri = (rows_i <= cols_i).astype(jnp.float32)
            cum_u = jax.lax.dot_general(
                u, tri, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
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

            # per-pair sums over the 256 pixels (sublane reductions).  (A
            # moment-basis MXU factorization of these sums was benchmarked at
            # parity — the kernel is not reduction-bound — and was dropped for
            # its reassociation error; see commit history.)
            rows = (
                jnp.sum(dl_dg * dg_ddelx, axis=0),
                jnp.sum(dl_dg * dg_ddely, axis=0),
                jnp.sum(-0.5 * gdx * dx * dl_dg, axis=0),
                jnp.sum(-0.5 * gdx * dy * dl_dg, axis=0),
                jnp.sum(-0.5 * gdy * dy * dl_dg, axis=0),
                jnp.sum(jnp.where(kept, g, 0.0) * dl_dalpha, axis=0),
                jnp.sum(w * ct_r, axis=0),
                jnp.sum(w * ct_g, axis=0),
                jnp.sum(w * ct_b, axis=0),
                jnp.sum(w * ct_d, axis=0),                      # d inv_depth
            )

            p_kept = jnp.where(kept, p_incl, jnp.inf)
            p_last = jnp.min(p_kept, axis=1, keepdims=True)
            tdp_vmem[0] = jnp.where(
                jnp.isfinite(p_last),
                jnp.broadcast_to(p_last, (TILE_PIXELS, CHUNK)), trans)
            tdp_vmem[1] = jnp.maximum(done, jnp.broadcast_to(jnp.any(
                indiv & (p_incl < T_EPS), axis=1, keepdims=True
            ).astype(jnp.float32), (TILE_PIXELS, CHUNK)))
            tdp_vmem[2] = prefix_u + jnp.broadcast_to(
                jnp.sum(u, axis=1, keepdims=True), (TILE_PIXELS, CHUNK))
            return rows

        tdp_vmem[0] = jnp.ones((TILE_PIXELS, CHUNK), jnp.float32)
        tdp_vmem[1] = jnp.zeros((TILE_PIXELS, CHUNK), jnp.float32)
        tdp_vmem[2] = jnp.zeros((TILE_PIXELS, CHUNK), jnp.float32)

        def body(carry):
            b = carry[0]
            even = b % 2 == 0

            # wait descriptors mirror the starts' astart base (see fwd kernel)
            @pl.when(even)
            def _():
                _feat_dma(feat_hbm, feat_vmem, sem_in, astart, b, 0).wait()

            @pl.when(jnp.logical_not(even))
            def _():
                _feat_dma(feat_hbm, feat_vmem, sem_in, astart, b, 1).wait()

            # the out slot being overwritten drained two blocks ago; zero-fill
            # it so chunks the liveness gate skips ship exact zeros (they are
            # within ``processed`` and must not leak stale slot contents)
            def free_and_clear(slot: int):
                @pl.when(b >= 2)
                def _():
                    out_dma(b - 2, slot).wait()
                grad_vmem[slot] = jnp.zeros((GRAD_ROWS, BLOCK), jnp.float32)

            @pl.when(even)
            def _():
                free_and_clear(0)

            @pl.when(jnp.logical_not(even))
            def _():
                free_and_clear(1)

            feat_blk = jnp.where(even, feat_vmem[0], feat_vmem[1])
            for us in range(BLOCK_CHUNKS):
                # chunks past the live span skip their VPU math entirely
                # (round 5): with every tile occupied at a few hundred pairs
                # (trained scenes) the all-masked dead chunks were ~25% of
                # kernel time.  pl.when cannot return values, so the chunk
                # state lives in tdp_vmem scratch (see one_chunk).
                @pl.when((b * BLOCK_CHUNKS + us) * CHUNK < span)
                def _(us=us):
                    rows = one_chunk(
                        feat_blk[:, us * CHUNK:(us + 1) * CHUNK],
                        b * BLOCK_CHUNKS + us)

                    def write_rows(slot: int):
                        for i, r in enumerate(rows):
                            grad_vmem[slot, i,
                                      us * CHUNK:(us + 1) * CHUNK] = r

                    @pl.when(even)
                    def _():
                        write_rows(0)

                    @pl.when(jnp.logical_not(even))
                    def _():
                        write_rows(1)

            def merge_and_send(slot: int):
                # block 0's head lanes belong to the PREVIOUS tile: restore its
                # already-written gradients before sending the block out
                @pl.when((b == 0) & (head > 0))
                def _():
                    merge_dma().wait()
                    lane2d = jax.lax.broadcasted_iota(
                        jnp.int32, (GRAD_ROWS, CHUNK), 1)
                    grad_vmem[slot, :, :CHUNK] = jnp.where(
                        lane2d < head, merge_vmem[:, :],
                        grad_vmem[slot, :, :CHUNK])

                out_dma(b, slot).start()

                # the freed in-slot prefetches block b+2
                @pl.when((b + 2) * BLOCK < span)
                def _():
                    _feat_dma(feat_hbm, feat_vmem, sem_in, astart, b + 2,
                              slot).start()

            @pl.when(even)
            def _():
                merge_and_send(0)

            @pl.when(jnp.logical_not(even))
            def _():
                merge_and_send(1)

            stop = jnp.min(tdp_vmem[1])
            return (b + 1, stop)

        def cond(carry):
            b, stop = carry
            return (b * BLOCK < span) & (stop == 0.0)

        (b_end, _) = jax.lax.while_loop(cond, body,
                                        (jnp.int32(0), jnp.float32(0.0)))

        # drain un-waited prefetched input DMAs (block x rides slot x % 2) ...
        even_end = b_end % 2 == 0

        @pl.when((b_end * BLOCK < span) & even_end)
        def _():
            _feat_dma(feat_hbm, feat_vmem, sem_in, astart, b_end, 0).wait()

        @pl.when((b_end * BLOCK < span) & jnp.logical_not(even_end))
        def _():
            _feat_dma(feat_hbm, feat_vmem, sem_in, astart, b_end, 1).wait()

        @pl.when(((b_end + 1) * BLOCK < span) & even_end)
        def _():
            _feat_dma(feat_hbm, feat_vmem, sem_in, astart, b_end + 1, 1).wait()

        @pl.when(((b_end + 1) * BLOCK < span) & jnp.logical_not(even_end))
        def _():
            _feat_dma(feat_hbm, feat_vmem, sem_in, astart, b_end + 1, 0).wait()

        # ... and the last two blocks' output DMAs (every processed block
        # started one; block x rides slot x % 2, so b_end-2 shares b_end's
        # parity and b_end-1 the opposite)
        @pl.when((b_end >= 2) & even_end)
        def _():
            out_dma(b_end - 2, 0).wait()

        @pl.when((b_end >= 2) & jnp.logical_not(even_end))
        def _():
            out_dma(b_end - 2, 1).wait()

        @pl.when((b_end >= 1) & even_end)
        def _():
            out_dma(b_end - 1, 1).wait()

        @pl.when((b_end >= 1) & jnp.logical_not(even_end))
        def _():
            out_dma(b_end - 1, 0).wait()

        # Early exit leaves this tile's remaining pair slots unwritten (garbage)
        # in the ANY-space output; report the processed slot count (relative to
        # the tile's floor-aligned base ``astart``) so the caller masks them out
        # of the segment sum (no serial zero-fill DMA tail).
        processed_ref[0, :, :] = jnp.full((8, 128), b_end * BLOCK, jnp.int32)


def composite_backward(prep: PreprocessOut, pairs: Pairs,
                       settings: RenderSettings,
                       color_pre_bg, final_t, dl_dpix, bg, row0=0,
                       interpret=False, layout=None,
                       depth_acc=None, dl_ddepth=None):
    """Pallas backward; same contract as rasterize.composite_backward
    (inverse depth rides as a 4th composited channel; feature row 9)."""
    n = prep.xy.shape[0]
    t = settings.band_tiles
    feat = layout if layout is not None else prepare_layout(prep, pairs)
    k_pad = feat.shape[1]                        # K + BLOCK
    k = k_pad - BLOCK
    row0_arr = jnp.asarray(row0, jnp.int32).reshape(1)

    if dl_ddepth is None:
        dl_ddepth = jnp.zeros_like(final_t)
        depth_acc = jnp.zeros_like(final_t)
    ctot_dot = (jnp.sum(color_pre_bg * dl_dpix, axis=-1)
                + depth_acc * dl_ddepth)                       # (T, P)
    bg_dot = jnp.sum(bg[None, None, :] * dl_dpix, axis=-1)    # (T, P)
    pix = jnp.stack([ctot_dot, bg_dot, final_t,
                     dl_dpix[:, :, 0], dl_dpix[:, :, 1], dl_dpix[:, :, 2],
                     dl_ddepth, jnp.zeros_like(final_t)],
                    axis=1)                                    # (T, 8, P)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec((1, 8, TILE_PIXELS), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((2, FEAT_ROWS, BLOCK), jnp.float32),
                        pltpu.VMEM((2, GRAD_ROWS, BLOCK), jnp.float32),
                        pltpu.VMEM((GRAD_ROWS, CHUNK), jnp.float32),
                        pltpu.VMEM((3, TILE_PIXELS, CHUNK), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA(())],
    )
    pair_grads, processed = pl.pallas_call(
        functools.partial(_bwd_kernel, settings.grid_x, settings.row_stride),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((GRAD_ROWS, k_pad), jnp.float32),
                   jax.ShapeDtypeStruct((t, 8, 128), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(pairs.tile_start, pairs.tile_count, row0_arr, feat, pix)

    # Mask slots the kernel never wrote (garbage in the ANY-space output):
    # the sentinel/culled tail beyond the last tile and pairs past a tile's
    # early-exit point.  ``processed`` counts slots from each tile's
    # floor-aligned base; forward-fill both down the pair axis (scatter +
    # cumsum; binning.py docstring).  Then segment-sum per Gaussian in
    # GAUSSIAN-MAJOR order: gather the masked rows to the pre-sort layout
    # (where each Gaussian's pairs are contiguous, offsets = gauss_cum) and
    # take cumsum differences at the segment ends — measured 4.4 ms vs
    # 7.1 ms for the K-row scatter-add this replaces (r4_micro2.py; XLA's
    # scatter is ~15 ns/row regardless of sortedness hints).
    from gstpu.ops.binning import fill_by_offsets

    pair_grads = pair_grads[:, :k]
    q = jnp.arange(k, dtype=jnp.int32)
    astart_t = pairs.tile_start - pairs.tile_start % CHUNK
    astart_q = fill_by_offsets(pairs.tile_start, astart_t, k)
    processed_q = fill_by_offsets(pairs.tile_start, processed[:, 0, 0], k)
    valid = (pairs.tile_id < t) & (q - astart_q < processed_q)
    pair_grads = jnp.where(valid[None, :], pair_grads, 0.0).T   # (K2, 16)
    # zero row at index k for gm slots whose pair was culled past the
    # two-tier slice (gm_pos >= k) — their gradients are exact zeros
    pair_grads = jnp.concatenate(
        [pair_grads, jnp.zeros((1, GRAD_ROWS), jnp.float32)])
    src = jnp.minimum(pairs.gm_pos, k)                     # (K_full,)
    grads_gm = pair_grads[src]                             # (K_full, 16)
    csum = _inclusive_cumsum(grads_gm)
    csum = jnp.concatenate([jnp.zeros((1, GRAD_ROWS), jnp.float32), csum])
    ends = jnp.clip(pairs.gauss_cum, 0, pairs.gm_pos.shape[0])
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
    acc = csum[ends] - csum[starts]                        # (N, 16)
    ddelx_dx = 0.5 * settings.width
    ddely_dy = 0.5 * settings.height

    d_mean2d = jnp.stack([acc[:, 0] * ddelx_dx, acc[:, 1] * ddely_dy], axis=-1)
    d_conic = acc[:, 2:5]
    d_opac = acc[:, 5]
    d_color = acc[:, 6:9]
    d_invd = acc[:, 9]
    return d_color, d_mean2d, d_conic, d_opac, d_invd

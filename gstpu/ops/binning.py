"""Tile binning: duplicate Gaussians per touched tile and sort by (tile, depth).

TPU-native replacement of the reference's dynamic pipeline
(forward.py:517-586, 753-840):

- the host readback of ``num_rendered`` (forward.py:764) is eliminated by a
  static pair capacity with sentinel-key padding (SURVEY §7.2.1);
- the scatter-style ``wp_duplicate_with_keys`` kernel (forward.py:517-558) is
  replaced by a *gather* formulation — pair k finds its Gaussian by rank in
  the inclusive prefix-sum of ``tiles_touched``;
- the 64-bit radix sort (forward.py:791-803) becomes a stable two-key
  ``jax.lax.sort`` on (tile_id, depth_bits): positive float32 depths order
  identically to their int32 bit patterns (depths pass the 0.2 near cull), so
  no 64-bit keys are needed;
- ``wp_identify_tile_ranges`` (forward.py:560-586) becomes two
  ``searchsorted`` calls on the sorted tile ids.

Performance note (TPU): ``jnp.searchsorted`` over K queries lowers to a
sequential ``lax.scan`` of gathers (~100ms/M queries) and per-element gathers
from small tables cost ~10ms/M, so the pair->gaussian rank and the run-local
offsets are computed with scatter + ``cumsum``/``cummax`` instead — segment
boundaries are scattered once (N or T elements) and broadcast down the K-sized
axis by monotone scans, which are bandwidth-bound (~1.5ms/M).  Per-pair
Gaussian attributes are fetched with ONE row gather from a packed (N, 8)
table (row gathers are ~25x cheaper per element than scalar gathers).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Pairs(NamedTuple):
    gauss_id: jnp.ndarray    # (K2,) int32 Gaussian index per sorted pair
    tile_id: jnp.ndarray     # (K2,) int32 tile per sorted pair (num_tiles = pad)
    tile_start: jnp.ndarray  # (T,) int32 first pair index of each tile
    tile_count: jnp.ndarray  # (T,) int32 pairs in each tile
    num_pairs: jnp.ndarray   # () int32 total pre-cull pairs (vs pair_capacity)
    num_kept: jnp.ndarray    # () int32 post-cull pairs (vs kept_capacity)
    # gaussian-major view of the sort (the grad epilogue's segment layout):
    # pre-sort pair order is gaussian-major (pair k belongs to gaussian
    # seg(k), consecutive pairs per gaussian), so these two arrays let the
    # backward epilogue segment-sum per-pair gradients with ONE row gather +
    # cumsum instead of a K-row scatter-add (~15 ns/row; r4_micro2.py).
    gm_pos: jnp.ndarray      # (K,) int32 sorted position of gm slot k
    gauss_cum: jnp.ndarray   # (N,) int32 inclusive cumsum of tiles_touched


def segment_ids_from_offsets(offsets: jnp.ndarray, k: int) -> jnp.ndarray:
    """seg[q] = #{i : offsets[i] <= q} for q in [0, k).

    ``offsets`` must be non-decreasing (an inclusive-prefix-sum / CSR row
    pointer).  Equivalent to ``searchsorted(offsets, arange(k), 'right')`` but
    runs as one scatter + one cumsum instead of a sequential binary-search
    scan (see module docstring).
    """
    hits = jnp.zeros((k,), jnp.int32).at[offsets].add(1, mode="drop")
    return jnp.cumsum(hits)


def run_starts(offsets: jnp.ndarray, k: int) -> jnp.ndarray:
    """start[q] = largest offsets[i] <= q (0 if none), offsets non-decreasing.

    The run-local index of slot q within its segment is ``q - start[q]``.
    (An isolated 1-D ``lax.cummax`` at K=425k measures 1.19 ms on TPU where
    ``cumsum`` is ~free, but replacing it with a ``fill_by_offsets(offsets,
    offsets)`` telescoped scatter+cumsum REGRESSED the frame 14.3 -> 15.2 ms:
    the scatter below is CSE'd with ``segment_ids_from_offsets``'s identical
    scatter, so the cummax formulation costs one shared scatter + one scan
    while the fill costs a second, differently-valued scatter.  Kept.)
    """
    iota = jnp.arange(k, dtype=jnp.int32)
    is_start = jnp.zeros((k,), jnp.int32).at[offsets].add(1, mode="drop") > 0
    return jax.lax.cummax(jnp.where(is_start, iota, 0))


def fill_by_offsets(offsets: jnp.ndarray, values: jnp.ndarray,
                    k: int) -> jnp.ndarray:
    """out[q] = values[seg(q)-1] forward-filled; out[q<offsets[0]] = 0.

    Broadcasts per-segment int32 ``values`` down a K axis: scatter-add the
    telescoped differences at each segment's start slot, then cumsum.
    Duplicate offsets (empty segments) telescope correctly — the surviving
    value is the last segment starting at that slot, which is the segment the
    slots belong to.
    """
    diffs = jnp.concatenate([values[:1], values[1:] - values[:-1]])
    seeded = jnp.zeros((k,), values.dtype).at[offsets].add(diffs, mode="drop")
    return jnp.cumsum(seeded)


def build_pairs(tiles_touched: jnp.ndarray, rect: jnp.ndarray,
                depth: jnp.ndarray, grid_x: int, num_tiles: int,
                pair_capacity: int, cull_xy: jnp.ndarray | None = None,
                cull_tcut: jnp.ndarray | None = None, row0=0,
                row_stride: int = 1,
                kept_capacity: int | None = None) -> Pairs:
    """Build the depth-sorted per-tile pair list.

    ``tiles_touched``: (N,) int32; ``rect``: (N,4) int32; ``depth``: (N,) f32.
    Pairs beyond ``pair_capacity`` are dropped (callers check ``num_pairs`` and
    re-trace with a larger capacity — the analog of the reference's 2^30 guard,
    forward.py:765-767).

    Per-tile culling (``cull_xy`` (N,2) splat centers + ``cull_tcut`` (N,)
    squared-distance thresholds, see RenderSettings.pair_cull): a pair is
    dropped iff the squared distance from the tile's pixel rect to the splat
    center exceeds ``t_cut = 2 ln(255 op) / lambda_min(conic)`` — then
    alpha < 1/255 at every pixel of the tile and the rasterizer would skip
    it anyway.  Culled pairs sort to the sentinel tail with the invalid
    ones, and the sorted list is sliced to ``kept_capacity`` so downstream
    stages run at the post-cull size (``num_kept`` reports the true
    requirement).  ``rect``/``tiles_touched`` may be band-local
    (clip_rect_to_band); ``row0``/``row_stride`` map band tile rows back to
    global pixel rows for the distance test.
    """
    n = tiles_touched.shape[0]
    k = pair_capacity
    k2 = kept_capacity if kept_capacity is not None else k

    cum = jnp.cumsum(tiles_touched)                    # inclusive prefix sum
    total = cum[-1]

    ks = jnp.arange(k, dtype=jnp.int32)
    # pair k belongs to the first gaussian g with cum[g] > k
    g = jnp.minimum(segment_ids_from_offsets(cum, k), n - 1)
    local = ks - run_starts(cum, k)                    # rect-local flat index

    # one row gather for all per-Gaussian attributes this stage needs
    cull = cull_xy is not None
    cols = [rect[:, 0], rect[:, 1], rect[:, 2],
            jax.lax.bitcast_convert_type(depth, jnp.int32)]
    if cull:
        bits = jax.lax.bitcast_convert_type
        cols += [bits(cull_xy[:, 0], jnp.int32), bits(cull_xy[:, 1], jnp.int32),
                 bits(cull_tcut, jnp.int32)]
    table = jnp.stack(cols, axis=-1)                   # (N, 4|7)
    rows = table[g]                                    # (K, 4|7) row gather
    rmin_x, rmin_y = rows[:, 0], rows[:, 1]
    rect_w = jnp.maximum(rows[:, 2] - rmin_x, 1)
    tx = rmin_x + local % rect_w
    ty = rmin_y + local // rect_w                      # band-local tile row
    tile = ty * grid_x + tx

    valid = ks < total
    if cull:
        bits_f = lambda c: jax.lax.bitcast_convert_type(rows[:, c], jnp.float32)
        cx, cy, tcut = bits_f(4), bits_f(5), bits_f(6)
        # tile pixel-center rect (pixel coords are integers, _pix_coords)
        x0 = (tx * 16).astype(jnp.float32)
        y0 = ((ty * row_stride + row0) * 16).astype(jnp.float32)
        dx = jnp.clip(cx, x0, x0 + 15.0) - cx
        dy = jnp.clip(cy, y0, y0 + 15.0) - cy
        valid = valid & (dx * dx + dy * dy <= tcut)
    kept = jnp.sum(valid.astype(jnp.int32)) if cull else total
    tile = jnp.where(valid, tile, num_tiles).astype(jnp.int32)
    depth_bits = jnp.where(valid, rows[:, 3], jnp.int32(2**31 - 1))

    tile_s, _, gauss_s, src_gm = jax.lax.sort(
        (tile, depth_bits, g, ks), num_keys=2, is_stable=True)
    # invert the sort permutation: src_gm is a permutation of [0, K), so
    # sorting it with a position rider yields, for each gaussian-major slot,
    # its position in the sorted pair list (~0.3 ms at K=426k — 20x cheaper
    # than the scatter that a direct inverse would need, r4_micro2.py)
    _, gm_pos = jax.lax.sort(
        (src_gm, jnp.arange(k, dtype=jnp.int32)), num_keys=1)
    # two-tier slice: culled/invalid pairs sorted to the tail; everything
    # after this line runs at the post-cull capacity
    tile_s, gauss_s = tile_s[:k2], gauss_s[:k2]

    # One searchsorted over T+1 queries yields starts AND ends: for integer
    # keys, searchsorted(a, t, 'right') == searchsorted(a, t+1, 'left'), so
    # end(t) = start(t+1).  (Two separate T-query calls measured 1.3-2.3 ms
    # per frame; this halves that.)
    tids = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(tile_s, tids, side="left").astype(jnp.int32)
    tile_start, tile_end = bounds[:-1], bounds[1:]
    return Pairs(gauss_id=gauss_s, tile_id=tile_s,
                 tile_start=tile_start, tile_count=tile_end - tile_start,
                 num_pairs=total, num_kept=kept,
                 gm_pos=gm_pos, gauss_cum=cum.astype(jnp.int32))

"""Tile binning: duplicate Gaussians per touched tile and sort by (tile, depth).

TPU-native replacement of the reference's dynamic pipeline
(forward.py:517-586, 753-840):

- the host readback of ``num_rendered`` (forward.py:764) is eliminated by a
  static pair capacity with sentinel-key padding (SURVEY §7.2.1);
- the scatter-style ``wp_duplicate_with_keys`` kernel (forward.py:517-558) is
  replaced by a *gather* formulation — pair k finds its Gaussian with one
  ``searchsorted`` into the inclusive prefix-sum of ``tiles_touched`` — so the
  whole stage is sort + gathers, no scatters;
- the 64-bit radix sort (forward.py:791-803) becomes a stable two-key
  ``jax.lax.sort`` on (tile_id, depth_bits): positive float32 depths order
  identically to their int32 bit patterns (depths pass the 0.2 near cull), so
  no 64-bit keys are needed;
- ``wp_identify_tile_ranges`` (forward.py:560-586) becomes two
  ``searchsorted`` calls on the sorted tile ids.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Pairs(NamedTuple):
    gauss_id: jnp.ndarray    # (K,) int32 Gaussian index per sorted pair
    tile_id: jnp.ndarray     # (K,) int32 tile per sorted pair (num_tiles = pad)
    tile_start: jnp.ndarray  # (T,) int32 first pair index of each tile
    tile_count: jnp.ndarray  # (T,) int32 pairs in each tile
    num_pairs: jnp.ndarray   # () int32 total real pairs (may exceed K: overflow!)


def build_pairs(tiles_touched: jnp.ndarray, rect: jnp.ndarray,
                depth: jnp.ndarray, grid_x: int, num_tiles: int,
                pair_capacity: int) -> Pairs:
    """Build the depth-sorted per-tile pair list.

    ``tiles_touched``: (N,) int32; ``rect``: (N,4) int32; ``depth``: (N,) f32.
    Pairs beyond ``pair_capacity`` are dropped (callers check ``num_pairs`` and
    re-trace with a larger capacity — the analog of the reference's 2^30 guard,
    forward.py:765-767).
    """
    n = tiles_touched.shape[0]
    k = pair_capacity

    cum = jnp.cumsum(tiles_touched)                    # inclusive prefix sum
    total = cum[-1]

    ks = jnp.arange(k, dtype=jnp.int32)
    # pair k belongs to the first gaussian g with cum[g] > k
    g = jnp.searchsorted(cum, ks, side="right").astype(jnp.int32)
    g = jnp.minimum(g, n - 1)
    prev = jnp.where(g > 0, cum[jnp.maximum(g - 1, 0)], 0)
    local = ks - prev                                  # rect-local flat index

    rmin_x = rect[g, 0]
    rmin_y = rect[g, 1]
    rect_w = jnp.maximum(rect[g, 2] - rmin_x, 1)
    tile = (rmin_y + local // rect_w) * grid_x + rmin_x + local % rect_w

    valid = ks < total
    tile = jnp.where(valid, tile, num_tiles).astype(jnp.int32)
    depth_bits = jax.lax.bitcast_convert_type(depth[g], jnp.int32)
    depth_bits = jnp.where(valid, depth_bits, jnp.int32(2**31 - 1))

    tile_s, _, gauss_s = jax.lax.sort(
        (tile, depth_bits, g), num_keys=2, is_stable=True)

    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_s, tids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_s, tids, side="right").astype(jnp.int32)
    return Pairs(gauss_id=gauss_s, tile_id=tile_s,
                 tile_start=tile_start, tile_count=tile_end - tile_start,
                 num_pairs=total)

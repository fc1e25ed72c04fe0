#!/usr/bin/env python
"""Round-4 micro-measurements part 2: grad segment-sum alternatives and
binning tile-range alternatives, at the bench scale (K~426k, N=100k).

The round-4 target is the 6 ms XLA scatter-add in the backward epilogue
(r4_micro.py: 'scatter-add @K rows'); this script measures every candidate
replacement end-to-end before any code moves.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

K = 425_984
N = 100_000
T = 2_500


def timeit(fn, *args, lo=2, hi=8):
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

    jax.config.update("jax_compilation_cache_dir", "/tmp/gstpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    rng = np.random.default_rng(0)
    # realistic id distribution: ~4.3 pairs per gaussian
    gid_np = np.sort(rng.integers(0, N, K).astype(np.int32))
    gid_sorted = jnp.asarray(gid_np)
    gid_rand = jnp.asarray(rng.permutation(gid_np))
    grads = jnp.asarray(rng.standard_normal((K, 16)).astype(np.float32))
    gradsT = grads.T
    _ = int(jnp.sum(grads).astype(jnp.int32))  # poison stream

    # --- baseline: unsorted scatter-add (current epilogue)
    f0 = jax.jit(lambda x, g: jnp.zeros((N, 16), jnp.float32).at[g].add(
        x, mode="drop"))
    print(f"scatter unsorted:          {timeit(f0, grads, gid_rand):7.2f} ms", flush=True)

    # --- sorted ids + indices_are_sorted hint
    f1 = jax.jit(lambda x, g: jnp.zeros((N, 16), jnp.float32).at[g].add(
        x, mode="drop", indices_are_sorted=True))
    print(f"scatter sorted+hint:       {timeit(f1, grads, gid_sorted):7.2f} ms", flush=True)

    # --- sorted ids + hint + unique=False explicit via segment_sum
    f2 = jax.jit(lambda x, g: jax.ops.segment_sum(
        x, g, num_segments=N, indices_are_sorted=True))
    print(f"segment_sum sorted:        {timeit(f2, grads, gid_sorted):7.2f} ms", flush=True)

    # --- cumsum-based sorted segment sum: cumsum rows then gather at ends
    ends = jnp.asarray(np.searchsorted(gid_np, np.arange(1, N + 1)),
                       jnp.int32)  # precomputable from tiles_touched cumsum

    def seg_cumsum(x, e):
        c = jnp.cumsum(x, axis=0)
        c = jnp.concatenate([jnp.zeros((1, 16), jnp.float32), c])
        return c[e] - c[jnp.concatenate([jnp.zeros((1,), jnp.int32), e[:-1]])]
    f3 = jax.jit(seg_cumsum)
    print(f"cumsum+ends gather:        {timeit(f3, grads, ends):7.2f} ms", flush=True)

    # components
    f3a = jax.jit(lambda x: jnp.cumsum(x, axis=0))
    print(f"  cumsum (K,16) axis0:     {timeit(f3a, grads):7.2f} ms", flush=True)
    f3b = jax.jit(lambda x: jnp.cumsum(x, axis=1))
    print(f"  cumsum (16,K) axis1:     {timeit(f3b, gradsT):7.2f} ms", flush=True)

    # --- full sorted pipeline: permute rows to gm order + cumsum + ends
    perm = jnp.asarray(rng.permutation(K).astype(np.int32))

    def full_sorted(xT, p, e):
        x = xT.T[p]
        return seg_cumsum(x, e)
    f4 = jax.jit(full_sorted)
    print(f"permute+cumsum+ends:       {timeit(f4, gradsT, perm, ends):7.2f} ms", flush=True)

    # --- binning alternatives: tile_start/tile_count from sorted tile ids
    tile_np = np.sort(rng.integers(0, T, K).astype(np.int32))
    tile_s = jnp.asarray(tile_np)
    tids = jnp.arange(T, dtype=jnp.int32)
    f5 = jax.jit(lambda ts: (
        jnp.searchsorted(ts, tids, side="left").astype(jnp.int32),
        jnp.searchsorted(ts, tids, side="right").astype(jnp.int32)))
    print(f"searchsorted 2x @T:        {timeit(f5, tile_s):7.2f} ms", flush=True)

    # histogram by scalar scatter @K then cumsum @T
    def hist_ranges(ts):
        cnt = jnp.zeros((T,), jnp.int32).at[ts].add(
            1, mode="drop", indices_are_sorted=True)
        end = jnp.cumsum(cnt)
        return end - cnt, cnt
    print(f"hist scatter@K + cumsum:   {timeit(jax.jit(hist_ranges), tile_s):7.2f} ms", flush=True)

    # boundary-diff: first-occurrence mask + scalar scatter @K of positions
    def bound_ranges(ts):
        qi = jnp.arange(K, dtype=jnp.int32)
        first = jnp.concatenate([jnp.ones((1,), bool), ts[1:] != ts[:-1]])
        tgt = jnp.where(first, ts, T)
        start = jnp.zeros((T,), jnp.int32).at[tgt].add(
            qi * first, mode="drop", indices_are_sorted=True)
        # start holds sum == the single first index per present tile; absent
        # tiles 0 — fix by cummax forward fill of ends instead (probe only)
        return start
    print(f"boundary scatter @K:       {timeit(jax.jit(bound_ranges), tile_s):7.2f} ms", flush=True)

    # --- scalar scatter @K cost reference (1 column)
    f6 = jax.jit(lambda v, g: jnp.zeros((N,), jnp.float32).at[g].add(
        v, mode="drop"))
    print(f"scalar scatter-add @K:     {timeit(f6, grads[:, 0], gid_rand):7.2f} ms", flush=True)

    # --- sort costs for producing gm order
    f7 = jax.jit(lambda a: jax.lax.sort((a, jnp.arange(K, dtype=jnp.int32)),
                                        num_keys=1, is_stable=True))
    print(f"sort 1key+rider @K:        {timeit(f7, gid_rand):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

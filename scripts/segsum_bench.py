#!/usr/bin/env python
"""Microbenchmark: per-Gaussian gradient segment-sum strategies.

The backward's last stage sums (K', 16) per-pair gradient rows into (N, 16)
per-Gaussian rows.  The shipped path is ONE row scatter-add
(``.at[gid].add``), measured ~15 ns/row regardless of row width.  Candidates:

a) scatter  — the shipped `.at[gid].add(rows)`
b) sortsum  — argsort gid, row-gather rows into gid order, cumsum along K',
              then per-segment total = csum[last slot] - csum[slot before
              first]; the two boundary row-sets are written with scatters of
              only ~N rows each (not K')
c) sortsum_pre — like (b) but the permutation is given (amortized: the
              binning stage could carry a by-gid rank), so only
              gather+cumsum+boundary work is timed

Run on the TPU: python scripts/segsum_bench.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N = 100_000
K = 440_320          # fitted aligned capacity at the bench scene
ROWS = 16


def timeit(fn, args, lo=5, hi=25):
    import jax
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    def run(k):
        o = None
        for _ in range(k):
            o = fn(*args)
        jax.block_until_ready(o)

    run(3)
    t0 = time.perf_counter()
    run(lo)
    t1 = time.perf_counter()
    run(hi)
    t2 = time.perf_counter()
    return (((t2 - t1) - (t1 - t0)) / (hi - lo)) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # gid distribution like the real one: sorted by (tile, depth) = locally
    # random Gaussian ids, each appearing ~K/N times
    gid = jnp.asarray(rng.integers(0, N, size=(K,)).astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(K, ROWS)).astype(np.float32))

    @jax.jit
    def scatter(gid, rows):
        return jnp.zeros((N, ROWS), jnp.float32).at[gid].add(rows, mode="drop")

    def _sorted_part(order, gid, rows):
        gid_s = gid[order]
        rows_s = rows[order]                          # (K,16) row gather
        csum = jnp.cumsum(rows_s, axis=0)             # (K,16) lane-wise scan
        is_last = jnp.concatenate([gid_s[1:] != gid_s[:-1],
                                   jnp.ones((1,), bool)])
        is_first = jnp.concatenate([jnp.ones((1,), bool),
                                    gid_s[1:] != gid_s[:-1]])
        csum_prev = jnp.concatenate([jnp.zeros((1, ROWS), jnp.float32),
                                     csum[:-1]])
        out = jnp.zeros((N + 1, ROWS), jnp.float32)
        out = out.at[jnp.where(is_last, gid_s, N)].add(csum, mode="drop")
        out = out.at[jnp.where(is_first, gid_s, N)].add(-csum_prev,
                                                        mode="drop")
        return out[:N]

    @jax.jit
    def sortsum(gid, rows):
        return _sorted_part(jnp.argsort(gid), gid, rows)

    perm = jnp.argsort(gid)

    @jax.jit
    def sortsum_pre(order, gid, rows):
        return _sorted_part(order, gid, rows)

    ref = np.asarray(scatter(gid, rows))
    for name, fn, args in (("scatter", scatter, (gid, rows)),
                           ("sortsum", sortsum, (gid, rows)),
                           ("sortsum_pre", sortsum_pre, (perm, gid, rows))):
        got = np.asarray(fn(*args))[:N]
        err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
        ms = timeit(fn, args)
        print(f"{name:12s}: {ms:7.2f} ms   max rel err {err:.2e}")


if __name__ == "__main__":
    main()

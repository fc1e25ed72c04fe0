#!/usr/bin/env python
"""Round-5 micro-bench: variants of the bwd-epilogue segment sum.

The epilogue (pallas_rasterize.composite_backward) permutes per-pair grads to
gaussian-major order (row gather) and segment-sums contiguous runs via a flat
``jnp.cumsum`` over (K, 16) + ends-diff — 4.4 ms total at K=409k (r4_micro2).
Candidates to shrink the cumsum term (~2.9 ms):

  flat       jnp.cumsum(x, axis=0)                      (shipped)
  two-level  intra-block cumsum (batched axis-1) + coarse block cumsum
  mxu        intra-block cumsum as a (B,B)-triangular matmul on the MXU
             + coarse block cumsum — turns the scan into ~1.6 GFLOP of
             systolic work instead of a bandwidth/latency-bound XLA scan

All variants are exact (f32 adds reassociated per block; the per-gaussian
sums see identical addition ORDER only for flat — two-level/mxu reassociate,
which is within the grad tolerance used by the parity gates, but verify
allclose here anyway).

Usage (TPU): python -m scripts.r5_segsum [K]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 409_600
C = 16
N = 100_000
B = 512


def timeit(fn, *a, lo=10, hi=40):
    out = fn(*a)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

    def run(k):
        o = None
        for _ in range(k):
            o = fn(*a)
        jax.block_until_ready(o)

    run(3)
    t0 = time.perf_counter(); run(lo)
    t1 = time.perf_counter(); run(hi)
    t2 = time.perf_counter()
    return (((t2 - t1) - (t1 - t0)) / (hi - lo)) * 1e3


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(K, C)).astype(np.float32))
src = jnp.asarray(rng.integers(0, K, K).astype(np.int32))   # gm_pos stand-in
# realistic contiguous segment ends at N gaussians
ends_np = np.sort(rng.integers(0, K, N)).astype(np.int32)
ends_np[-1] = K
ends = jnp.asarray(ends_np)
starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])


def seg_flat(x, src):
    g = x[src]
    cs = jnp.cumsum(g, axis=0)
    cs = jnp.concatenate([jnp.zeros((1, C), jnp.float32), cs])
    return cs[ends] - cs[starts]


def _csum_two_level(g):
    nb = K // B
    gb = g.reshape(nb, B, C)
    intra = jnp.cumsum(gb, axis=1)
    coarse = jnp.cumsum(intra[:, -1], axis=0) - intra[:, -1]
    return (intra + coarse[:, None, :]).reshape(K, C)


def seg_two_level(x, src):
    g = x[src]
    cs = jnp.concatenate([jnp.zeros((1, C), jnp.float32),
                          _csum_two_level(g)])
    return cs[ends] - cs[starts]


def _csum_mxu(g):
    nb = K // B
    gb = g.reshape(nb, B, C)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    tri = (rows_i <= cols_i).astype(jnp.float32)
    # intra[k, j, c] = sum_i<=j gb[k, i, c]
    intra = jax.lax.dot_general(
        tri, gb, (((0,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)          # (B, nb, C)? check dims
    intra = jnp.moveaxis(intra, 0, 1)                # (nb, B, C)
    coarse = jnp.cumsum(intra[:, -1], axis=0) - intra[:, -1]
    return (intra + coarse[:, None, :]).reshape(K, C)


def seg_mxu(x, src):
    g = x[src]
    cs = jnp.concatenate([jnp.zeros((1, C), jnp.float32), _csum_mxu(g)])
    return cs[ends] - cs[starts]


def seg_gather_only(x, src):
    return x[src]


def cumsum_only_flat(x):
    return jnp.cumsum(x, axis=0)


def cumsum_only_two(x):
    return _csum_two_level(x)


def cumsum_only_mxu(x):
    return _csum_mxu(x)


ref = jax.jit(seg_flat)(x, src)
for name, fn in [("flat", seg_flat), ("two_level", seg_two_level),
                 ("mxu", seg_mxu)]:
    f = jax.jit(fn)
    out = f(x, src)
    err = float(jnp.max(jnp.abs(out - ref)))
    ms = timeit(f, x, src)
    print(f"seg_{name:10s} {ms:7.3f} ms   max|diff|={err:.2e}", flush=True)

for name, fn in [("gather_only", seg_gather_only),
                 ("cs_flat", cumsum_only_flat),
                 ("cs_two", cumsum_only_two), ("cs_mxu", cumsum_only_mxu)]:
    f = jax.jit(fn)
    a = (x, src) if name == "gather_only" else (x,)
    ms = timeit(f, *a)
    print(f"{name:14s} {ms:7.3f} ms", flush=True)

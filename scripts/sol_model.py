"""Speed-of-light model for the rasterize fwd+bwd frame (VERDICT r1 item 3).

Round 1's ``vs_baseline`` normalized against an arbitrary 100 ms budget.
This script computes a *measured* per-frame floor: each irreducible stage of
the algorithm is microbenchmarked in isolation at the bench scene's volumes,
with perfect layout and no plumbing —

- fwd compositing: the per-(pixel,pair) alpha math + prefix-transmittance +
  weighted accumulation, run by a Pallas kernel on VMEM-RESIDENT data (zero
  DMA, no masking, no early-exit bookkeeping).  This is what the hardware
  charges for the algorithm's inner loop and nothing else.
- bwd compositing: same, with the gradient math (incl. the in-chunk prefix
  sum) and per-pair reductions.
- pair sort: ``lax.sort`` (2-key stable) at the live pair count.
- binning scans: the two cumsum/cummax broadcasts the gather-binning needs.
- HBM traffic: the feature/gradient bytes the kernels must move, at the
  measured copy bandwidth.

The floor is algorithm-relative (this tile-splatting formulation, f32
compositing), not an absolute rendering bound.  Writes SOL.json at the repo
root; bench.py reports ``vs_sol = sol_ms / measured_ms`` from it.

Usage: python scripts/sol_model.py   (on the TPU; ~1 min)
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Bench-scene volumes (bench.py): 100k Gaussians, 800x800, measured 413,741
# live pairs -> capacity 2^19.
N_GAUSSIANS = 100_000
WIDTH = HEIGHT = 800
LIVE_PAIRS = 413_741
TILES = (WIDTH // 16) * (HEIGHT // 16)
CHUNK = 128
PIX = 256


def _timeit(fn, iters_lo=5, iters_hi=25):
    import jax
    import jax.numpy as jnp

    def run(k):
        out = None
        for _ in range(k):
            out = fn()
        jax.block_until_ready(out)

    # poison the remote stream with a real D2H so block_until_ready truly
    # synchronizes (PERF_NOTES "axon" traps)
    out = fn()
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

    run(3)
    t0 = time.perf_counter()
    run(iters_lo)
    t1 = time.perf_counter()
    run(iters_hi)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (iters_hi - iters_lo)


def sol_compositing(n_chunks_per_tile: int, backward: bool):
    """Pallas kernel doing ONLY the per-chunk compositing math (fwd) or
    gradient math (bwd) on resident VMEM data; returns seconds/frame."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(feat_ref, out_ref):
        feat = feat_ref[0]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        pixf_x = jax.lax.broadcasted_iota(
            jnp.int32, (PIX, 1), 0).astype(jnp.float32) * 0.0625
        pixf_y = pixf_x * 0.5

        def body(c, carry):
            trans, acc, prefix_u = carry
            # tie the feature values to the loop counter so Mosaic cannot
            # hoist the alpha/prefix math out of the loop (a loop-invariant
            # body made the round-2 first cut of this floor ~3x too low)
            fc = feat * (1.0 + c.astype(jnp.float32) * 1e-7)
            x = fc[0:1, :]
            y = fc[1:2, :]
            ca = fc[2:3, :]
            cb = fc[3:4, :]
            cc = fc[4:5, :]
            op = fc[5:6, :]
            dx = x - pixf_x
            dy = y - pixf_y
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            g = jnp.exp(jnp.minimum(power, 0.0))
            alpha = jnp.minimum(0.99, op * g)
            alpha = jnp.where(alpha >= (1.0 / 255.0), alpha, 0.0)
            prod = 1.0 - alpha
            shift = 1
            while shift < CHUNK:
                rolled = pltpu.roll(prod, shift, axis=1)
                prod = prod * jnp.where(lanes >= shift, rolled, 1.0)
                shift *= 2
            p_incl = trans * prod
            t_ex = p_incl / (1.0 - alpha)
            kept = p_incl >= 1e-4
            w = jnp.where(kept, alpha * t_ex, 0.0)
            if not backward:
                acc = (acc[0] + w * fc[6:7, :], acc[1] + w * fc[7:8, :],
                       acc[2] + w * fc[8:9, :], acc[3] + w * fc[9:10, :])
            else:
                cdot = (fc[6:7, :] + fc[7:8, :] + fc[8:9, :]
                        + fc[9:10, :]) * w
                u = w * cdot
                rows_i = jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK, CHUNK), 0)
                cols_i = jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK, CHUNK), 1)
                tri = (rows_i <= cols_i).astype(jnp.float32)
                cum_u = jax.lax.dot_general(
                    u, tri, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                inv_one_m = 1.0 / (1.0 - alpha)
                dl_da = jnp.where(kept, cdot * t_ex
                                  - (prefix_u + cum_u) * inv_one_m
                                  - inv_one_m * 0.25, 0.0)
                dl_dg = op * dl_da
                gdx = g * dx
                gdy = g * dy
                # all 10 per-pair grad-row reductions of the real kernel
                r = (jnp.sum(dl_dg * (-gdx * ca - gdy * cb), axis=0,
                             keepdims=True)
                     + jnp.sum(dl_dg * (-gdy * cc - gdx * cb), axis=0,
                               keepdims=True)
                     + jnp.sum(-0.5 * gdx * dx * dl_dg, axis=0,
                               keepdims=True)
                     + jnp.sum(-0.5 * gdx * dy * dl_dg, axis=0,
                               keepdims=True)
                     + jnp.sum(-0.5 * gdy * dy * dl_dg, axis=0,
                               keepdims=True)
                     + jnp.sum(jnp.where(kept, g, 0.0) * dl_da, axis=0,
                               keepdims=True))
                r2 = (jnp.sum(w * pixf_x, axis=0, keepdims=True)
                      + jnp.sum(w * pixf_y, axis=0, keepdims=True)
                      + jnp.sum(w * (pixf_x + 1.0), axis=0, keepdims=True)
                      + jnp.sum(w * cdot, axis=0, keepdims=True))
                acc = (acc[0] + r, acc[1] + r2, acc[2], acc[3])
                prefix_u = prefix_u + jnp.sum(u, axis=1, keepdims=True)
            p_last = jnp.min(jnp.where(kept, p_incl, jnp.inf), axis=1,
                             keepdims=True)
            trans = jnp.where(jnp.isfinite(p_last), p_last, trans)
            return trans, acc, prefix_u

        zc = jnp.zeros((PIX, CHUNK), jnp.float32) if not backward \
            else jnp.zeros((1, CHUNK), jnp.float32)
        init = (jnp.ones((PIX, 1), jnp.float32), (zc, zc, zc, zc),
                jnp.zeros((PIX, 1), jnp.float32))
        trans, acc, _ = jax.lax.fori_loop(
            0, n_chunks_per_tile, lambda c, s: body(c, s), init)
        out_ref[0, 0, :] = jnp.sum(acc[0], axis=1) if not backward \
            else acc[0][0]
        out_ref[0, 1, :] = trans[:, 0] if not backward else acc[1][0]

    feat = jnp.asarray(
        np.random.default_rng(0).uniform(0.3, 0.9, (1, 16, CHUNK))
        .astype(np.float32))
    run = pl.pallas_call(
        kernel,
        grid=(TILES,),
        in_specs=[pl.BlockSpec((1, 16, CHUNK), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, 2, PIX if not backward else CHUNK), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (TILES, 2, PIX if not backward else CHUNK), jnp.float32),
    )
    jitted = jax.jit(lambda f: run(f))
    return _timeit(lambda: jitted(feat))


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    backend = jax.default_backend()

    # perfectly balanced chunk count per tile (the floor assumes ideal
    # pair balance across tiles — that is what "speed of light" means here)
    n_chunks = int(np.ceil(LIVE_PAIRS / TILES / CHUNK))

    fwd_s = sol_compositing(n_chunks, backward=False)
    bwd_s = sol_compositing(n_chunks, backward=True)

    # sort at the live pair count (2-key stable, as build_pairs)
    k = 1 << int(np.ceil(np.log2(LIVE_PAIRS)))
    a = jnp.asarray(rng.integers(0, TILES, k).astype(np.int32))
    b = jnp.asarray(rng.integers(0, 1 << 30, k).astype(np.int32))
    c = jnp.asarray(rng.integers(0, N_GAUSSIANS, k).astype(np.int32))
    sort_fn = jax.jit(lambda x, y, z: jax.lax.sort((x, y, z), num_keys=2,
                                                   is_stable=True))
    sort_s = _timeit(lambda: sort_fn(a, b, c))

    # the two segment-broadcast scans binning fundamentally needs
    scan_fn = jax.jit(lambda x: (jnp.cumsum(x), jax.lax.cummax(x)))
    scan_s = _timeit(lambda: scan_fn(b))

    # HBM bytes at measured copy bandwidth: feature write+read (fwd) + read
    # (bwd) + grad write+read + per-Gaussian grads write
    big = jnp.asarray(rng.uniform(size=(16, k)).astype(np.float32))
    copy_fn = jax.jit(lambda x: x + 1.0)
    copy_s = _timeit(lambda: copy_fn(big))
    bw = 2 * big.size * 4 / copy_s  # bytes/s (read + write)
    feat_bytes = 5 * 16 * k * 4 + 2 * N_GAUSSIANS * 16 * 4
    dma_s = feat_bytes / bw

    stages = {
        "fwd_compositing_ms": fwd_s * 1e3,
        "bwd_compositing_ms": bwd_s * 1e3,
        "pair_sort_ms": sort_s * 1e3,
        "binning_scans_ms": scan_s * 1e3,
        "hbm_traffic_ms": dma_s * 1e3,
    }
    sol_ms = sum(stages.values())
    out = {
        "sol_ms": round(sol_ms, 3),
        "stages": {k_: round(v, 3) for k_, v in stages.items()},
        "volumes": {"n_gaussians": N_GAUSSIANS, "live_pairs": LIVE_PAIRS,
                    "tiles": TILES, "chunks_per_tile": n_chunks,
                    "resolution": f"{WIDTH}x{HEIGHT}"},
        "hbm_bandwidth_gbps": round(bw / 1e9, 1),
        "backend": backend,
        "note": "algorithm-relative floor: isolated-stage microbenchmarks "
                "at bench volumes, perfect balance, zero plumbing",
    }
    path = Path(__file__).resolve().parents[1] / "SOL.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Measured one-chip scaling proxy for the multi-chip tile sharding
(VERDICT r1 item 4: BASELINE's >=80% scaling row had no measured backing).

Only one physical chip is attached, but the sharded step's per-device WORK
is exactly a strided-band render (each device renders tile rows [d::n] of
the frame plus the replicated preprocess + band-clipped binning —
gstpu/parallel/sharded.py).  So per-device wall time is measurable here:
time the fwd+bwd band render for every device slot d at n = 2/4/8, take the
slowest (the step's critical path), and combine with the measured collective
payloads (params all_gather ~6 MB over ICI, <0.1 ms on v5p — PERF_NOTES) into
a projected scaling efficiency:

    eff(n) = T_full / (n * (max_d T_band(n, d) + t_collective))

Writes SCALING.json.  Usage: python scripts/scaling_proxy.py  (on the TPU)
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_GAUSSIANS = 100_000   # override with --n <count>
WIDTH = HEIGHT = 800
T_COLLECTIVE_MS = 0.1  # measured upper bound for the ~6MB ICI collectives


def main():
    import jax
    import jax.numpy as jnp

    global N_GAUSSIANS
    if "--n" in sys.argv:
        N_GAUSSIANS = int(sys.argv[sys.argv.index("--n") + 1])
    # --repeats R: median-of-R on every band/frame timing (VERDICT r3 item
    # 4: the projection keys off the WORST band, and a max over noisy
    # measurements is biased upward — one ±1 ms tunnel spike on any of the 8
    # bands lands straight in eff(8); the median of repeated captures
    # removes the spike without hiding real imbalance).
    repeats = int(sys.argv[sys.argv.index("--repeats") + 1]) \
        if "--repeats" in sys.argv else 1

    # persistent compile cache (the band graphs dominate run time otherwise)
    jax.config.update("jax_compilation_cache_dir", "/tmp/gstpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from gstpu.config import RenderSettings
    from gstpu.ops.losses import l1_loss
    from gstpu.ops.rasterize import render
    from tests.scenes import example_camera, random_scene

    use_pallas = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    cam = example_camera(width=WIDTH, height=HEIGHT)
    pts, shs, scales, rotations, opacities = random_scene(
        rng, n=N_GAUSSIANS, extent=1.3, z_center=-10.0,
        opacity_range=(0.05, 0.9), scale_range=(0.01, 0.05))
    j = jnp.asarray
    args = (j(pts), j(scales), j(rotations), j(opacities), j(shs))
    cam_args = (j(cam["view"]), j(cam["proj"]), j(cam["campos"]),
                jnp.zeros(3, jnp.float32))

    def make_fwd_bwd(settings, row0):
        h_band = settings.band_rows * 16
        target = j(rng.uniform(0, 1, (h_band, settings.grid_x * 16, 3))
                   .astype(np.float32))

        @jax.jit
        def fwd_bwd(means, scales_, rots, opac, shs_):
            def loss_fn(m, s, r_, o, sh):
                img, _, _ = render(settings, cam["tan_fovx"], cam["tan_fovy"],
                                   1.0, m, s, r_, o, sh, *cam_args, None,
                                   jnp.int32(row0))
                return l1_loss(img, target)
            return jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
                *[means, scales_, rots, opac, shs_])
        return fwd_bwd

    def timeit(fn, lo=5, hi=20):
        out = fn(*args)
        # poison the stream (axon trap)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

        def run(k):
            o = None
            for _ in range(k):
                o = fn(*args)
            jax.block_until_ready(o)

        run(3)
        vals = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            run(lo)
            t1 = time.perf_counter()
            run(hi)
            t2 = time.perf_counter()
            vals.append((((t2 - t1) - (t1 - t0)) / (hi - lo)) * 1e3)
        return float(np.median(vals))

    # Fit the pair capacities to the scene exactly like bench.py
    # (the trainer auto-sizes the same way) — comparing a fitted full frame
    # against padded-capacity bands (or vice versa) would skew efficiency.
    from gstpu.config import RenderSettings as _RS
    from gstpu.ops.preprocess import preprocess as _pre0
    from gstpu.ops.rasterize import clip_rect_to_band as _clip

    probe = _RS(width=WIDTH, height=HEIGHT, tight_radius=True)
    pr = jax.jit(lambda *a: _pre0(
        *a, WIDTH, HEIGHT, cam["tan_fovx"], cam["tan_fovy"], probe.grid_x,
        probe.grid_y, 3, tight_radius=True))(*args, *cam_args[:3])
    tiles_np = np.asarray(pr.tiles_touched)
    rect_np = np.asarray(pr.rect)

    def fit_cap(live):
        return -(-int(live * 1.05) // 8192) * 8192

    def band_live(n, d):
        """Live pairs for device d's round-robin rows d::n."""
        band_rows = -(-probe.grid_y // n)
        _, tiles_b = _clip(jnp.asarray(rect_np), jnp.asarray(tiles_np),
                           jnp.int32(d), band_rows, n)
        return int(np.asarray(tiles_b).sum())

    # post-cull pair count (RenderSettings.pair_cull; same fitting as bench)
    from gstpu.ops.rasterize import _render_fwd as _probe_fwd
    cap0 = fit_cap(int(tiles_np.sum()))
    probe_cull = dataclasses.replace(probe, pair_capacity=cap0,
                                     pair_cull=True)
    (_, _, probe_aux), _ = jax.jit(
        lambda *a: _probe_fwd(probe_cull, cam["tan_fovx"], cam["tan_fovy"],
                              1.0, *a, *cam_args, None, jnp.int32(0)))(*args)
    kept_frac = int(probe_aux.num_kept) / max(int(probe_aux.num_pairs), 1)

    base = RenderSettings(width=WIDTH, height=HEIGHT,
                          pair_capacity=cap0,
                          kept_capacity=fit_cap(int(probe_aux.num_kept)),
                          pair_cull=True,
                          use_pallas=use_pallas, tight_radius=True)
    t_full = timeit(make_fwd_bwd(base, 0))
    result = {"t_full_ms": round(t_full, 3), "bands": {},
              "n_gaussians": N_GAUSSIANS, "live_pairs": int(tiles_np.sum()),
              "repeats": repeats,
              "backend": jax.default_backend(), "pallas": use_pallas}

    # The sharded step runs the per-Gaussian preprocess ADJOINT chain only
    # on each device's 1/n Gaussian slice (RenderSettings.shard_axis; the
    # band render here runs outside shard_map, so it pays the full-N chain).
    # Measure the chain at N and N/n and adjust the projection.
    from gstpu.ops import preprocess_bwd
    from gstpu.ops.preprocess import preprocess as _pre

    prep = jax.jit(lambda *a: _pre(
        *a, WIDTH, HEIGHT, cam["tan_fovx"], cam["tan_fovy"], base.grid_x,
        base.grid_y, 3, tight_radius=True))(*args, *cam_args[:3])

    def chain_ms(nn):
        sl = lambda x: x[:nn]
        ct3 = j(rng.normal(size=(nn, 3)).astype(np.float32))
        ct2 = j(rng.normal(size=(nn, 2)).astype(np.float32))
        fx = WIDTH / (2.0 * cam["tan_fovx"])
        fy = HEIGHT / (2.0 * cam["tan_fovy"])

        @jax.jit
        def chain(means, cov3d, radii, shs_, clamped, scales_, rots, dcn,
                  dm2, dcl):
            dmean_cov, dcov3d = preprocess_bwd.cov2d_backward(
                means, cov3d, radii, fx, fy, cam["tan_fovx"],
                cam["tan_fovy"], cam_args[0], dcn, parity=True)
            dmean_proj = preprocess_bwd.projection_backward(
                means, radii, cam_args[1], dm2)
            dsh, dmean_sh = preprocess_bwd.sh_backward(
                means, shs_, radii, cam_args[2], clamped, dcl, 3)
            dscale, drot = preprocess_bwd.cov3d_backward(
                scales_, rots, radii, 1.0, dcov3d, parity=True)
            return dmean_cov + dmean_proj + dmean_sh, dsh, dscale, drot

        # materialize the sliced inputs ONCE — eager slicing inside the
        # timed call costs ~1.5 ms per op over the axon tunnel
        ins = jax.block_until_ready((
            sl(args[0]), sl(prep.cov3d), sl(prep.radii), sl(args[4]),
            sl(prep.clamped), sl(args[1]), sl(args[2]), ct3, ct2, ct3))
        # sub-ms op over a ~27ms/sync tunnel: the 5/20-iter slope is
        # noise-dominated (a -1.5 ms "measurement" produced an unphysical
        # >1.0 projected efficiency in one capture); amortize much harder
        # and clamp at zero
        return max(timeit(lambda *_: chain(*ins), lo=40, hi=200), 0.0)

    # Preprocess fwd at N vs N/n: the sharded step preprocesses only each
    # device's slice (rasterize._render_fwd sharded_prep), but the band
    # renders below run outside shard_map and pay the full-N stage.
    def pre_ms(nn):
        ins = jax.block_until_ready(tuple(a[:nn] for a in args))

        @jax.jit
        def pre(*a):
            return _pre0(*a, *cam_args[:3], WIDTH, HEIGHT, cam["tan_fovx"],
                         cam["tan_fovy"], probe.grid_x, probe.grid_y, 3,
                         tight_radius=True)
        # same sub-ms amortization + clamp as chain_ms
        return max(timeit(lambda *_: pre(*ins), lo=40, hi=200), 0.0)

    grid_y = base.grid_y
    for n in (2, 4, 8):
        rows = -(-grid_y // n)
        # ONE compile per n: size every device's graph for the worst band
        # (the critical path), fitted like the full frame
        worst_live = max(band_live(n, d) for d in range(n))
        cap = fit_cap(worst_live)
        s = dataclasses.replace(base, tile_rows=rows, row_stride=n,
                                pair_capacity=cap,
                                kept_capacity=fit_cap(worst_live * kept_frac))
        # the worst band IS the projection: at n=8 a band is ~5 ms, so the
        # 3/12-iter slope carried ~±1 ms of tunnel noise straight into the
        # efficiency — amortize harder (runtime cost is trivial vs compiles)
        band_ms = [timeit(make_fwd_bwd(s, d), lo=10, hi=40)
                   for d in range(n)]
        worst = max(band_ms)
        chain_full = chain_ms(N_GAUSSIANS)
        chain_slice_raw = chain_ms(N_GAUSSIANS // n)
        pre_full = pre_ms(N_GAUSSIANS)
        pre_slice_raw = pre_ms(N_GAUSSIANS // n)
        # a 1/n-work slice cannot cost less than full/n (per-element work is
        # uniform; overheads only ADD) — a measurement below that floor is
        # tunnel noise and, fed raw into ``adj``, would bias the adjusted
        # efficiency upward (ADVICE r3).  Floor it and record both values.
        chain_slice = max(chain_slice_raw, chain_full / n)
        pre_slice = max(pre_slice_raw, pre_full / n)
        adj = worst - chain_full + chain_slice - pre_full + pre_slice
        eff_raw = t_full / (n * (worst + T_COLLECTIVE_MS))
        eff_adj_raw = t_full / (n * (adj + 3 * T_COLLECTIVE_MS))
        # a projection above 1.0 is a measurement artifact, not superlinear
        # scaling — clamp BOTH metrics and flag it so the artifact is
        # visible in the record (ADVICE r3: a silent clamp read as perfect
        # scaling in SCALING_1000k.json)
        eff = min(eff_raw, 1.0)
        eff_adj = min(eff_adj_raw, 1.0)
        result["bands"][str(n)] = {
            "per_device_ms": [round(x, 3) for x in band_ms],
            "worst_ms": round(worst, 3),
            "chain_full_ms": round(chain_full, 3),
            "chain_slice_ms": round(chain_slice, 3),
            "chain_slice_raw_ms": round(chain_slice_raw, 3),
            "pre_full_ms": round(pre_full, 3),
            "pre_slice_ms": round(pre_slice, 3),
            "pre_slice_raw_ms": round(pre_slice_raw, 3),
            "slice_floored": bool(chain_slice != chain_slice_raw
                                  or pre_slice != pre_slice_raw),
            "projected_efficiency_replicated": round(eff, 4),
            "projected_efficiency": round(eff_adj, 4),
            "clamped": bool(eff_raw > 1.0 or eff_adj_raw > 1.0),
            "raw_unclamped": {"replicated": round(eff_raw, 4),
                              "adjusted": round(eff_adj_raw, 4)},
        }
        print(f"n={n}: worst band {worst:.2f} ms, chain {chain_full:.2f}->"
              f"{chain_slice:.2f}, pre {pre_full:.2f}->{pre_slice:.2f}, "
              f"projected eff {eff_adj:.3f} (replicated {eff:.3f})")

    # Data-parallel (camera-batch) scaling: each device runs the FULL
    # fwd+bwd on its own camera (per-device work == t_full, measured) and
    # all-reduces the parameter gradients over 'data'
    # (gstpu/parallel/sharded.py psum).  The collective is modeled from the
    # payload (59 floats/Gaussian: pos 3 + scale 3 + rot 4 + opac 1 + SH 48)
    # at a conservative per-link ICI bandwidth — it cannot be measured on
    # one chip, but at these sizes it is a <1% term, so the model risk is
    # bounded.  Throughput (frames/s) scaling — the multi-camera regime the
    # reference's one-camera-per-step loop cannot reach at all.
    ICI_GBPS = 90.0  # conservative v5-class per-link all-reduce bandwidth
    grad_mb = N_GAUSSIANS * 59 * 4 / 1e6
    result["data_parallel"] = {}
    for n in (2, 4, 8):
        t_ar = 2 * (n - 1) / n * grad_mb / (ICI_GBPS * 1e3)  # ms
        result["data_parallel"][str(n)] = {
            "allreduce_ms_modeled": round(t_ar, 3),
            "projected_efficiency": round(t_full / (t_full + t_ar), 4),
        }
    print("data-parallel eff (modeled collective):",
          {k: v["projected_efficiency"]
           for k, v in result["data_parallel"].items()})

    name = "SCALING.json" if N_GAUSSIANS == 100_000 \
        else f"SCALING_{N_GAUSSIANS // 1000}k.json"
    path = Path(__file__).resolve().parents[1] / name
    path.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()

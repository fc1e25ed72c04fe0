#!/usr/bin/env python
"""Headline benchmark: rasterize fwd+bwd ms/frame at 800x800.

Scene: 100k random Gaussians in the reference's init cube ([-1.3, 1.3]^3,
train.py:52-58) viewed by the reference smoke-test camera — i.e., the Lego
training configuration at an early-training Gaussian count scale.

The reference publishes NO performance numbers (BASELINE.md); ``vs_baseline``
normalizes against a fixed 100 ms/frame budget so progress is comparable
across rounds (higher = better; 1.0 == 100 ms/frame).

Prints one JSON line:
  {"metric": "rasterize_fwd_bwd_ms_per_frame", "value": ..., "unit": "ms",
   "vs_baseline": ...}
"""

import json
import subprocess
import sys
import time

import numpy as np

BASELINE_BUDGET_MS = 100.0
N_GAUSSIANS = 100_000
WIDTH = HEIGHT = 800
WARMUP = 3
ITERS_LO = 5
ITERS_HI = 25

# Backend-outage policy (round 2: BENCH_r02 was rc=1 because the remote-TPU
# tunnel hung/errored at init — an environment outage, not a code failure).
# Probe the backend in a SUBPROCESS (a hung init can't be cancelled in-process
# and jax caches backend-init failures for the process lifetime), retry with
# sleeps, and if it never comes up emit an explicit JSON error record with
# rc=0 so the driver parses the outage instead of recording nothing.
PROBE_TRIES = 6
PROBE_TIMEOUT_S = 180
PROBE_SLEEP_S = 30


def _probe_backend() -> tuple[bool, str]:
    """Wait for the device backend to come up; returns (ok, detail)."""
    code = ("import jax; d = jax.devices(); "
            "print('BACKEND_OK', jax.default_backend(), len(d))")
    detail = ""
    for attempt in range(PROBE_TRIES):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=PROBE_TIMEOUT_S)
            if "BACKEND_OK" in r.stdout:
                return True, r.stdout.strip().splitlines()[-1]
            detail = (r.stderr or r.stdout).strip().splitlines()[-1:] or [""]
            detail = detail[0][-300:]
        except subprocess.TimeoutExpired:
            detail = f"backend init hang (> {PROBE_TIMEOUT_S}s)"
        if attempt < PROBE_TRIES - 1:
            time.sleep(PROBE_SLEEP_S)
    return False, detail


def main():
    if "--skip-probe" not in sys.argv:
        ok, detail = _probe_backend()
        if not ok:
            print(json.dumps({
                "metric": "rasterize_fwd_bwd_ms_per_frame",
                "value": None, "unit": "ms", "vs_baseline": None,
                "error": "backend_unavailable",
                "detail": detail,
                "note": ("device backend never initialized after "
                         f"{PROBE_TRIES} probes x {PROBE_TIMEOUT_S}s — "
                         "environment outage, not a code failure"),
            }))
            return

    import jax
    import jax.numpy as jnp

    # persistent compile cache: the parity gate + bench graphs are expensive
    # to compile; cache across runs in the same container
    jax.config.update("jax_compilation_cache_dir", "/tmp/gstpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from gstpu.config import RenderSettings
    from gstpu.ops.losses import l1_loss
    from gstpu.ops.rasterize import render
    from tests.scenes import example_camera, random_scene

    use_pallas = "--no-pallas" not in sys.argv and (
        jax.default_backend() == "tpu")
    if use_pallas:
        try:
            from gstpu.ops import pallas_rasterize  # noqa: F401
        except ImportError:
            use_pallas = False

    rng = np.random.default_rng(0)
    cam = example_camera(width=WIDTH, height=HEIGHT)
    pts, shs, scales, rotations, opacities = random_scene(
        rng, n=N_GAUSSIANS, extent=1.3, z_center=-10.0,
        opacity_range=(0.05, 0.9), scale_range=(0.01, 0.05))
    j = jnp.asarray
    args = (j(pts), j(scales), j(rotations), j(opacities), j(shs))
    cam_args = (j(cam["view"]), j(cam["proj"]), j(cam["campos"]),
                jnp.zeros(3, jnp.float32))
    target = j(rng.uniform(0, 1, (HEIGHT, WIDTH, 3)).astype(np.float32))

    # Fit the pair capacities to the scene (the trainer auto-sizes the same
    # way): every capacity-sized stage — binning scans, feature gathers,
    # the grad scatter-add (~15 ns/row) — scales with these.
    from gstpu.ops.preprocess import preprocess as _pre

    probe = RenderSettings(width=WIDTH, height=HEIGHT, tight_radius=True)
    pr = jax.jit(lambda *a: _pre(
        *a, WIDTH, HEIGHT, cam["tan_fovx"], cam["tan_fovy"], probe.grid_x,
        probe.grid_y, 3, tight_radius=True))(*args, *cam_args[:3])
    live = int(np.asarray(pr.tiles_touched).sum())
    pair_capacity = -(-int(live * 1.05) // 8192) * 8192
    # two-tier: count post-cull pairs once (see RenderSettings.pair_cull) and
    # size every downstream stage to them
    import dataclasses

    from gstpu.ops.rasterize import _render_fwd as _probe_fwd
    probe_cull = dataclasses.replace(probe, pair_capacity=pair_capacity,
                                     pair_cull=True)
    (_, _, probe_aux), _ = jax.jit(
        lambda *a: _probe_fwd(probe_cull, cam["tan_fovx"], cam["tan_fovy"],
                              1.0, *a, *cam_args, None, jnp.int32(0)))(*args)
    kept = int(probe_aux.num_kept)
    kept_capacity = -(-int(kept * 1.05) // 8192) * 8192
    settings = RenderSettings(width=WIDTH, height=HEIGHT,
                              pair_capacity=pair_capacity,
                              kept_capacity=kept_capacity, pair_cull=True,
                              use_pallas=use_pallas, tight_radius=True)

    @jax.jit
    def fwd_bwd(means, scales_, rots, opac, shs_):
        def loss_fn(m, s, r, o, sh):
            img, _, _ = render(settings, cam["tan_fovx"], cam["tan_fovy"],
                               1.0, m, s, r, o, sh, *cam_args, None,
                               jnp.int32(0))
            return l1_loss(img, target)
        return jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
            means, scales_, rots, opac, shs_)

    # Compiled-Pallas parity gate: runs in the SAME session as the headline
    # number so Mosaic regressions cannot hide behind interpret-mode CI
    # (VERDICT r1 item 8).  --skip-parity to bypass.
    parity_ok = None
    if use_pallas and "--skip-parity" not in sys.argv:
        from gstpu.ops.pallas_check import compiled_parity_check
        parity = compiled_parity_check()
        parity_ok = parity["ok"]
        if not parity_ok:
            print(json.dumps({"error": "pallas_parity_failed", **parity}),
                  file=sys.stderr)

    # Force the remote-device stream into truly synchronous mode before timing
    # (block_until_ready is a no-op until the first D2H; PERF_NOTES.md).
    _ = float(jnp.sum(args[0]))

    def run(iters):
        out = None
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd_bwd(*args)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    run(WARMUP)  # compile + warm caches
    # slope between two iteration counts cancels the fixed per-sync cost of
    # the remote-TPU tunnel (~27ms/sync) — reports steady-state per-frame time
    ms = (run(ITERS_HI) - run(ITERS_LO)) / (ITERS_HI - ITERS_LO) * 1e3

    extra = {
        "gaussians_per_s": round(N_GAUSSIANS / (ms / 1e3)),
        "n_gaussians": N_GAUSSIANS,
        "resolution": f"{WIDTH}x{HEIGHT}",
        "backend": jax.default_backend(),
        "pallas": use_pallas,
    }

    # Trained-scene companion (VERDICT r3 item 7): the random init cube has
    # different pair statistics than a trained point cloud (13.6% vs 44%
    # cull rate; PERF_NOTES), so the headline alone under-represents the
    # workload that matters.  Uses GSTPU_BENCH_PLY, else the newest
    # committed/locally-trained Lego checkpoint; silently skipped if none.
    import glob
    import os
    ply_candidates = ([os.environ["GSTPU_BENCH_PLY"]]
                      if os.environ.get("GSTPU_BENCH_PLY") else []) + \
        ["assets/lego_trained.ply"] + sorted(
            glob.glob("/tmp/lego_*/point_cloud/*/point_cloud.ply"),
            key=os.path.getmtime, reverse=True)
    ply = next((p for p in ply_candidates if os.path.exists(p)), None)
    if ply is not None:
        try:
            from gstpu.data.nerf import NerfSyntheticDataset
            from gstpu.utils.ply import load_ply, render_space_params

            data = NerfSyntheticDataset("/root/reference/data/lego", "train")
            # --activated checkpoints store log-scales/logit-opacities
            # (official 3DGS convention); map to render space (BENCH_r04's
            # trained_scene_error: raw interpretation of log-scales gave
            # screen-covering splats and a 54 GB binning allocation)
            p = render_space_params(load_ply(ply))
            n = p["positions"].shape[0]
            tcam = data.camera(0)
            targs = (j(p["positions"]), j(p["scales"]), j(p["rotations"]),
                     j(p["opacities"]), j(p["shs"].reshape(n, 16, 3)))
            tcam_args = (j(tcam["world_to_camera"]),
                         j(tcam["full_proj_matrix"]),
                         j(tcam["camera_center"]), jnp.zeros(3, jnp.float32))
            ttarget = j(np.asarray(data.image(0)))
            # fit capacities to the trained scene exactly like the headline
            tprobe = jax.jit(lambda *a: _pre(
                *a, data.width, data.height, tcam["tan_fovx"],
                tcam["tan_fovy"], probe.grid_x, probe.grid_y, 3,
                tight_radius=True))(*targs, *tcam_args[:3])
            tlive = int(np.asarray(tprobe.tiles_touched).sum())
            tcap = -(-max(int(tlive * 1.05), 1) // 8192) * 8192
            tp_cull = dataclasses.replace(probe, pair_capacity=tcap,
                                          pair_cull=True)
            (_, _, taux), _ = jax.jit(
                lambda *a: _probe_fwd(tp_cull, tcam["tan_fovx"],
                                      tcam["tan_fovy"], 1.0, *a, *tcam_args,
                                      None, jnp.int32(0)))(*targs)
            tkept_cap = -(-max(int(taux.num_kept) * 21 // 20, 1)
                          // 8192) * 8192
            tset = dataclasses.replace(settings, pair_capacity=tcap,
                                       kept_capacity=tkept_cap)

            @jax.jit
            def t_fwd_bwd(m, s_, r, o, sh):
                def loss_fn(*q):
                    img, _, _ = render(tset, tcam["tan_fovx"],
                                       tcam["tan_fovy"], 1.0, *q, *tcam_args,
                                       None, jnp.int32(0))
                    return l1_loss(img, ttarget)
                return jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
                    m, s_, r, o, sh)

            def trun(iters):
                out = None
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = t_fwd_bwd(*targs)
                jax.block_until_ready(out)
                return time.perf_counter() - t0

            trun(WARMUP)
            tms = (trun(ITERS_HI) - trun(ITERS_LO)) \
                / (ITERS_HI - ITERS_LO) * 1e3
            extra["trained_scene_ms"] = round(tms, 3)
            extra["trained_scene_gaussians"] = int(n)
            extra["trained_scene_pairs_kept"] = int(taux.num_kept)
            extra["trained_scene_ply"] = ply
        except Exception as e:  # never let the companion kill the headline
            extra["trained_scene_error"] = f"{type(e).__name__}: {e}"[:200]
    if parity_ok is not None:
        extra["pallas_parity_ok"] = parity_ok
    # measured speed-of-light floor (scripts/sol_model.py -> SOL.json):
    # vs_sol = fraction of the algorithm's achievable per-frame floor
    try:
        import pathlib
        sol = json.loads((pathlib.Path(__file__).parent / "SOL.json")
                         .read_text())
        if sol.get("backend") == jax.default_backend():
            extra["sol_ms"] = sol["sol_ms"]
            extra["vs_sol"] = round(sol["sol_ms"] / ms, 4)
    except (FileNotFoundError, KeyError, ValueError):
        pass

    print(json.dumps({
        "metric": "rasterize_fwd_bwd_ms_per_frame",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_BUDGET_MS / ms, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()

"""Measured reference-vs-gstpu TRAINING comparison (VERDICT r1 item 5).

Runs the reference's own training loop (its unmodified NeRFGaussianSplatting
Trainer, executing under the NumPy Warp shim) and gstpu's Trainer on the SAME
tiny dataset with the SAME config, the SAME injected initial parameters, and
the SAME camera order — then reports per-step loss agreement and final PSNR
for both, measured.  Full-scale Lego under the interpreted reference is
infeasible (~hours/iteration at 800x800 in pure Python), so the comparison
runs at 64x64 / few hundred points, which exercises the full train step
(render -> L1 -> backward -> scheduled Adam + the iteration-0 opacity reset)
end to end.  ``--densify`` additionally drives the reference's own
densification_and_pruning (train.py:351-714 + optimizer.py:143-416) under
the shim through repeated clone/split/prune events with both sides' noise
pinned to the same index-keyed hash, and reports per-event Gaussian-count
agreement (VERDICT r2 item 5).

Both final parameter sets are evaluated with the SAME renderer (gstpu's,
which is golden-tested against the reference's forward kernels), so the PSNR
comparison isolates the *training* dynamics.

Usage: python scripts/compare_ref_training.py [--iterations 100]
Writes JSON to stdout and tests/golden/train_compare.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
from pathlib import Path

import numpy as np

os.environ.setdefault("MPLBACKEND", "Agg")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

if jax.config.jax_platforms is None:
    jax.config.update("jax_platforms", "cpu")


def make_dataset(root: Path) -> Path:
    from scripts.make_tiny_nerf import make_dataset as mk

    data = root / "tiny_nerf_cmp"
    if not (data / "transforms_train.json").exists():
        mk(data, size=64, n_train=4, n_val=2)
    # the reference Trainer requires a test split; mirror val
    if not (data / "transforms_test.json").exists():
        tj = json.loads((data / "transforms_val.json").read_text())
        for f in tj["frames"]:
            f["file_path"] = f["file_path"].replace("./val/", "./test/")
        (data / "transforms_test.json").write_text(json.dumps(tj))
        shutil.copytree(data / "val", data / "test", dirs_exist_ok=True)
    return data


def shared_init(n: int, seed: int = 7, mixed_scales: bool = False):
    """One initial parameter set injected into BOTH trainers (reference init
    distribution: U(-1.3,1.3)^3 positions, 0.1 iso scales, identity quat —
    the TRUE identity, both sides accept arbitrary quats — 0.1 opacity,
    DC=-0.007 SH).  ``mixed_scales`` gives half the Gaussians small (0.01)
    scales so densification events produce BOTH clones (small + high grad)
    and splits (large + high grad) against the percent_dense threshold."""
    rng = np.random.default_rng(seed)
    scales = np.full((n, 3), 0.1, np.float32)
    if mixed_scales:
        scales[::2] = 0.01
    return {
        "positions": rng.uniform(-1.3, 1.3, (n, 3)).astype(np.float32),
        "scales": scales,
        "rotations": np.tile(np.array([0, 0, 0, 1], np.float32), (n, 1)),
        "opacities": np.full(n, 0.1, np.float32),
        "shs": np.concatenate(
            [np.full((n, 1, 3), -0.007, np.float32),
             np.zeros((n, 15, 3), np.float32)], axis=1),
    }


# --------------------------------------------------------------------------
# Index-keyed densify noise, identical on both sides (SURVEY Q11: noise
# MAGNITUDES matter, bit-parity of the PRNG does not — so for the parity
# harness we pin both sides to the same cheap index hash instead of
# replicating Warp's PRNG bit-for-bit).  The reference keys clone noise by
# source index i (optimizer.py:350-352) and split jitter by target index
# new_idx (optimizer.py:295-299); gstpu's densify hooks expose exactly those
# indices.
# --------------------------------------------------------------------------

def _hash01(seed):
    return (seed % 1024) / 1024.0


def pin_densify_noise():
    """Monkeypatch the shim's randf and gstpu's densify noise hooks to the
    same index-keyed hash."""
    import jax.numpy as jnp

    from gstpu import densify
    from tests.warp_shim import warpstub as wp

    wp.randf = lambda seed: np.float32(_hash01(int(seed)))
    wp.oob_read_zero = True  # Q14 semantics (see warpstub.array.__getitem__)
    wp.oob_write_drop = True  # Q16 semantics (see warpstub.array.__setitem__)

    def clone_noise(key, n, scale):
        seeds = (jnp.arange(n, dtype=jnp.int32)[:, None] * 3
                 + jnp.arange(3, dtype=jnp.int32)[None, :])
        return ((seeds % 1024).astype(jnp.float32) / 1024.0) * scale

    def split_jitter(key, target_idx, scale):
        seeds = (target_idx[:, None].astype(jnp.int32) * 3
                 + jnp.arange(3, dtype=jnp.int32)[None, :])
        u = (seeds % 1024).astype(jnp.float32) / 1024.0
        return (u * 2.0 - 1.0) * scale

    densify.clone_position_noise = clone_noise
    densify.split_position_jitter = split_jitter


def run_reference(data: Path, out: Path, init, cam_seq, iterations: int,
                  cfg_overrides=None):
    from tests.warp_shim import load_reference_module, warpstub as wp

    ref_train = load_reference_module("train")
    ref_train.GaussianParams.update(
        num_points=len(init["opacities"]), num_iterations=iterations,
        save_interval=1 << 30)
    # .get()-trap keys (densify_from_iter, min_valid_points, ...) are not
    # GaussianParams fields — inject them through the ctor's raw config dict
    # (train.py:129-130 ``self.config.update(config)``), which train.py's
    # ``self.config.get(...)`` reads (train.py:385-391, 644)
    trainer = ref_train.NeRFGaussianSplattingTrainer(
        str(data), str(out), config=cfg_overrides)
    # inject the shared init
    trainer.params["positions"] = wp.array(init["positions"], dtype=wp.vec3)
    trainer.params["scales"] = wp.array(init["scales"], dtype=wp.vec3)
    trainer.params["rotations"] = wp.array(init["rotations"], dtype=wp.vec4)
    trainer.params["opacities"] = wp.array(init["opacities"], dtype=float)
    trainer.params["shs"] = wp.array(init["shs"].reshape(-1, 3),
                                     dtype=wp.vec3)
    # pin the camera order (np.random.randint is used only for the pick,
    # train.py:928)
    it = iter([int(c) for c in cam_seq])
    orig = np.random.randint
    np.random.randint = lambda lo, hi=None, **kw: next(it)
    # record the Gaussian count after every densification call that changed
    # topology (train.py:1060: called once per iteration, post-Adam)
    events: list[dict] = []
    orig_dp = trainer.densification_and_pruning

    def dp(iteration):
        orig_dp(iteration)
        events.append({"iteration": int(iteration),
                       "n": int(trainer.num_points)})

    trainer.densification_and_pruning = dp
    try:
        trainer.train()
    finally:
        np.random.randint = orig
    params = {k: np.array(v.numpy()) for k, v in trainer.params.items()}
    params["shs"] = params["shs"].reshape(-1, 16, 3)
    return [float(l) for l in trainer.losses], params, events


def run_gstpu(data: Path, out: Path, init, cam_seq, iterations: int,
              cfg_overrides=None):
    import jax.numpy as jnp

    from gstpu.config import GSConfig
    from gstpu.trainer import Trainer

    n = len(init["opacities"])
    cfg = GSConfig(num_points=n, num_iterations=iterations,
                   save_interval=1 << 30, **(cfg_overrides or {}))
    trainer = Trainer(str(data), str(out), config=cfg)
    pads = {k: np.zeros((trainer.model.capacity - n,) + v.shape[1:],
                        np.float32) for k, v in init.items()}
    trainer.model = trainer.model.replace(
        **{k: jnp.asarray(np.concatenate([v, pads[k]])) for k, v in
           init.items()})

    class _FakeRng:
        """Camera-order pin with a positional bit_generator so the trainer's
        rollback snapshots (trainer.py take_snap) can save/restore it."""

        def __init__(self, seq):
            self._seq = [int(c) for c in seq]
            self._pos = 0
            outer = self

            class _BG:
                @property
                def state(self):
                    return outer._pos

                @state.setter
                def state(self, v):
                    outer._pos = v

            self.bit_generator = _BG()

        def _next(self):
            v = self._seq[self._pos]
            self._pos += 1
            return v

        def integers(self, lo, hi=None, size=None):
            if size is None:
                return self._next()
            return np.array([self._next() for _ in range(size)])

    orig = np.random.default_rng
    np.random.default_rng = lambda *a, **kw: _FakeRng(cam_seq)
    try:
        trainer.train()
    finally:
        np.random.default_rng = orig
    n_alive = int(trainer.model.n_alive)
    params = {k: np.asarray(v)[:n_alive] for k, v in
              trainer.model.param_dict().items()}
    events = []
    for line in (Path(out) / "metrics.jsonl").read_text().splitlines():
        rec = json.loads(line)
        if rec.get("event") == "densify":
            events.append({"iteration": rec["iteration"],
                           "n": rec["n_alive"], "cloned": rec["cloned"],
                           "split": rec["split"], "pruned": rec["pruned"]})
    return [float(l) for l in trainer.losses], params, events


def eval_psnr(data: Path, params) -> float:
    """Mean PSNR over the train views, rendered with gstpu (golden-tested
    against the reference forward — the shared yardstick)."""
    import jax.numpy as jnp

    from gstpu.data.nerf import NerfSyntheticDataset
    from gstpu.render import render_gaussians

    ds = NerfSyntheticDataset(str(data), "train")
    vals = []
    for i in range(len(ds)):
        cam = ds.camera(i)
        img, _, _ = render_gaussians(
            background=np.zeros(3, np.float32),
            means3D=params["positions"], opacity=params["opacities"],
            scales=params["scales"], rotations=params["rotations"],
            viewmatrix=cam["world_to_camera"],
            projmatrix=cam["full_proj_matrix"],
            tan_fovx=cam["tan_fovx"], tan_fovy=cam["tan_fovy"],
            image_height=ds.height, image_width=ds.width,
            sh=params["shs"], degree=3, campos=cam["camera_center"])
        target = ds.image(i)
        mse = float(np.mean((np.asarray(img) - target) ** 2))
        vals.append(-10.0 * np.log10(max(mse, 1e-12)))
    return float(np.mean(vals))


def run_compare(iterations=100, num_points=300, workdir="/tmp/gstpu_cmp",
                densify=False, frozen=False, write_golden=True):
    """Full head-to-head; returns the result dict (see main for modes)."""
    args = argparse.Namespace(iterations=iterations, num_points=num_points,
                              workdir=workdir, densify=densify,
                              frozen=frozen)
    root = Path(args.workdir)
    data = make_dataset(root)
    init = shared_init(args.num_points, mixed_scales=args.densify)
    rng = np.random.default_rng(11)
    cam_seq = rng.integers(0, 4, size=args.iterations)

    overrides = None
    ref_extra = {}
    gs_extra = {}
    if args.densify:
        if args.iterations == 100:
            args.iterations = 50
            cam_seq = rng.integers(0, 4, size=args.iterations)
        # Lower the gates so densify fires every 15 steps from step 15 on
        # (train.py:385-391 semantics: fires when it > from and % interval
        # == 0), let prune engage at tiny scale (min_valid default 1000),
        # and make the event MASKS drift-robust: with a negligible grad
        # threshold every rendered Gaussian is "high-grad", so clone vs
        # split is decided by the bimodal scale split (0.01 vs 0.1 — far
        # from percent_dense * extent) instead of knife-edge grad-threshold
        # comparisons that f32 state drift flips (measured: ~1e-3 relative
        # loss drift by step 40 flips ~3 of 300 mask bits, compounding).
        # q16_last_index replicates the reference's exclusive-scan count
        # off-by-one on the gstpu side (gstpu/config.py Q16); the reference
        # ctor-config dict simply ignores the unknown key.
        overrides = dict(densify_from_iter=10, densification_interval=15,
                         densify_until_iter=1 << 30, min_valid_points=10,
                         densify_grad_threshold=1e-12, q16_last_index=True)
        pin_densify_noise()
        if args.frozen:
            # Exact-match regime: grad threshold 0.0 passes EVERY alive
            # Gaussian (the reference compares >=, optimizer.py:199/232 —
            # visibility knife-edges gone), lr=1e-30 freezes all parameters
            # bit-exactly (scales stay at their 0.01/0.1 init modes, far
            # from percent_dense*extent = 0.04), and cull threshold -1
            # disables real pruning (the Q16 forced compaction still
            # engages the prune path every event).  lr=0 exactly would
            # crash the reference's scheduler (final_lr/initial_lr = 0/0,
            # scheduler.py:25).
            overrides.update(densify_grad_threshold=0.0,
                             cull_opacity_threshold=-1.0,
                             densify_from_iter=0, densification_interval=2)
            if args.iterations == 50:
                args.iterations = 7        # events at 2, 4, 6; N 300 -> ~2400
                cam_seq = cam_seq[:7]
            lr0 = 1e-30
            ref_extra = dict(lr_scheduler_config={
                "lr_pos": lr0, "lr_scale": lr0, "lr_rot": lr0,
                "lr_sh": lr0, "lr_opac": lr0, "final_lr_factor": 0.01})
            gs_extra = dict(lr_pos=lr0, lr_scale=lr0, lr_rot=lr0,
                            lr_sh=lr0, lr_opac=lr0)

    # fresh output dirs: the trainers APPEND to metrics.jsonl/losses, and a
    # previous run's densify events would pollute the event comparison
    import shutil
    shutil.rmtree(root / "ref_out", ignore_errors=True)
    shutil.rmtree(root / "gstpu_out", ignore_errors=True)

    ref_losses, ref_params, ref_events = run_reference(
        data, root / "ref_out", init, cam_seq, args.iterations,
        {**(overrides or {}), **ref_extra} if (overrides or ref_extra)
        else None)
    gs_losses, gs_params, gs_events = run_gstpu(
        data, root / "gstpu_out", init, cam_seq, args.iterations,
        {**(overrides or {}), **gs_extra} if (overrides or gs_extra)
        else None)

    k = min(len(ref_losses), len(gs_losses))
    r = np.asarray(ref_losses[:k])
    g = np.asarray(gs_losses[:k])
    rel = np.abs(r - g) / np.maximum(np.abs(r), 1e-8)
    result = {
        "iterations": args.iterations,
        "num_points": args.num_points,
        "ref_final_loss_mean10": float(r[-10:].mean()),
        "gstpu_final_loss_mean10": float(g[-10:].mean()),
        "loss_max_rel_diff_first20": float(rel[:20].max()),
        "loss_mean_rel_diff": float(rel.mean()),
        "ref_train_psnr": eval_psnr(data, ref_params),
        "gstpu_train_psnr": eval_psnr(data, gs_params),
    }
    if args.densify:
        # per-event Gaussian-count agreement: the reference records n after
        # EVERY densification call; compare at gstpu's in-window iterations
        ref_n = {e["iteration"]: e["n"] for e in ref_events}
        matches = [ref_n.get(e["iteration"]) == e["n"] for e in gs_events]
        changed = [e for e in gs_events
                   if e["cloned"] or e["split"] or e["pruned"]]
        result.update({
            "densify_events": gs_events,
            "ref_event_n": [{"iteration": e["iteration"], "n": ref_n.get(
                e["iteration"])} for e in gs_events],
            "n_topology_changes": len(changed),
            "counts_match": bool(matches and all(matches)),
            "ref_final_n": len(ref_params["opacities"]),
            "gstpu_final_n": len(gs_params["opacities"]),
        })
    if args.densify:
        result["mode"] = "frozen" if args.frozen else "live"
        name = ("train_compare_densify_frozen.json" if args.frozen
                else "train_compare_densify.json")
    else:
        name = "train_compare.json"
    if write_golden:
        out_path = Path(__file__).resolve().parents[1] / "tests" / "golden" \
            / name
        out_path.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=100)
    ap.add_argument("--num-points", type=int, default=300)
    ap.add_argument("--workdir", default="/tmp/gstpu_cmp")
    ap.add_argument("--densify", action="store_true", help=(
        "run at a scale where densification fires repeatedly (VERDICT r2 "
        "item 5): the reference's OWN densification_and_pruning executes "
        "under the shim, both sides' clone/split noise is pinned to the "
        "same index-keyed hash, and per-event Gaussian counts are compared"))
    ap.add_argument("--frozen", action="store_true", help=(
        "with --densify: freeze parameter evolution (lr=1e-30, far below "
        "f32 ulp of any parameter, so Adam updates round to exact no-ops) "
        "and pick thresholds no evolving quantity can cross.  Event masks "
        "become bit-deterministic, so per-event Gaussian counts must match "
        "EXACTLY — any mismatch is a logic error, not f32 state drift.  "
        "(The realistic --densify config keeps thresholds live and "
        "quantifies the drift-induced mask flips instead.)"))
    a = ap.parse_args()
    run_compare(a.iterations, a.num_points, a.workdir, a.densify, a.frozen)


if __name__ == "__main__":
    main()

"""End-to-end Trainer smoke tests on a tiny synthetic dataset (CPU).

Covers the full driver surface the reference exercises manually
(train.py:920-1066): the jitted train step, deferred metric flushing,
checkpoint artifacts (PLY + loss.txt + orbax state), PSNR eval, and resume —
the reference has no resume path at all (SURVEY §5).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from gstpu.config import GSConfig


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    from scripts.make_tiny_nerf import make_dataset
    path = tmp_path_factory.mktemp("tiny_nerf")
    make_dataset(path, size=32, n_train=3, n_val=2)
    return path


def _config():
    return GSConfig(num_points=64, num_iterations=6, save_interval=5,
                    densify_from_iter=2, densification_interval=3,
                    min_valid_points=1)


def test_train_loop_end_to_end(tiny_dataset, tmp_path):
    from gstpu.trainer import Trainer

    out = tmp_path / "out"
    trainer = Trainer(str(tiny_dataset), str(out),
                      _config().replace(eval_views=1))
    trainer.train()

    losses = [line for line in open(out / "loss.txt")]
    assert len(losses) == 6
    assert all(np.isfinite(float(x)) for x in losses)

    metrics = [json.loads(line) for line in open(out / "metrics.jsonl")]
    evals = [m for m in metrics if m.get("event") == "eval"]
    assert evals and np.isfinite(evals[-1]["psnr"])
    # eval_views threads into MID-training evals only; the end-of-training
    # eval always covers the full splits (VERDICT r3 weak #3)
    assert all(m["views"] == 1 for m in evals)
    full = [m for m in metrics if m.get("event") == "eval_full"]
    assert full and full[-1]["views"] == 2

    ply = out / "point_cloud" / "iteration_5" / "point_cloud.ply"
    assert ply.exists() and ply.stat().st_size > 0


def test_train_resume_continues(tiny_dataset, tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from gstpu.trainer import Trainer

    out = tmp_path / "out"
    t1 = Trainer(str(tiny_dataset), str(out), _config())
    t1.train()

    t2 = Trainer(str(tiny_dataset), str(out), _config().replace(
        num_iterations=9))
    t2.restore(5)
    assert t2.iteration == 6
    t2.train()
    assert t2.iteration == 9
    metrics = [json.loads(line) for line in open(out / "metrics.jsonl")]
    assert metrics[-1] == {"event": "done", "iteration": 9}


def test_train_loop_sharded_mesh(tiny_dataset, tmp_path):
    """Multi-chip training end-to-end on the virtual CPU mesh: params + Adam
    sharded over 'model', 2 cameras per step over 'data', densify via
    gather -> mutate -> re-shard."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from gstpu.parallel import make_mesh
    from gstpu.trainer import Trainer

    mesh = make_mesh(n_data=2, n_model=4)
    out = tmp_path / "out"
    trainer = Trainer(str(tiny_dataset), str(out), _config(), mesh=mesh)
    assert trainer.model.capacity % 4 == 0
    trainer.train()

    losses = [float(x) for x in open(out / "loss.txt")]
    assert len(losses) == 6 and all(np.isfinite(x) for x in losses)
    metrics = [json.loads(line) for line in open(out / "metrics.jsonl")]
    evals = [m for m in metrics if m.get("event") == "eval"]
    assert evals and np.isfinite(evals[-1]["psnr"])


def test_eval_render_regrows_band_fitted_capacity(tiny_dataset, tmp_path):
    """Under a mesh the training pair capacity is fitted to the per-BAND
    need; a full-frame eval render must detect the shortfall and regrow its
    own capacity instead of silently dropping tiles (round-3 fix)."""
    import jax
    import jax.numpy as jnp
    from gstpu.trainer import Trainer

    out = tmp_path / "out"
    trainer = Trainer(str(tiny_dataset), str(out), _config())
    cam = trainer.train_data.camera(0)
    args = (jnp.asarray(cam["world_to_camera"]),
            jnp.asarray(cam["full_proj_matrix"]),
            jnp.asarray(cam["camera_center"]))
    ample, _, aux_full = trainer._render_full(trainer.model, *args)
    need = int(aux_full.num_pairs)
    assert need > 0

    # Simulate a post-shrink band fit far below the full-frame need.  The
    # production rounding floor (16k) would mask the overflow on a tiny
    # scene, so drop it for the regrow assertion.
    trainer._round_capacity = lambda pairs: max(int(pairs), 8)
    cap = max(8, need // 4)
    trainer._pair_capacity = trainer._kept_capacity = cap
    trainer._eval_pair_capacity = trainer._eval_kept_capacity = cap
    img, _, aux = trainer._render_full(trainer.model, *args)
    assert int(aux.num_pairs) == need
    assert trainer._eval_pair_capacity >= need  # regrew past the band fit
    np.testing.assert_allclose(np.asarray(img), np.asarray(ample),
                               rtol=0, atol=1e-6)


def test_sh_degree_warmup(tiny_dataset, tmp_path):
    """sh_degree_interval grows the active SH degree (official-3DGS warmup)."""
    from gstpu.trainer import Trainer

    trainer = Trainer(str(tiny_dataset), str(tmp_path / "o"),
                      _config().replace(sh_degree_interval=2))
    assert trainer._settings(0).sh_degree == 0
    assert trainer._settings(3).sh_degree == 1
    assert trainer._settings(99).sh_degree == 3
    assert trainer._settings(None).sh_degree == 3  # eval uses full degree
    trainer.train()  # runs through the degree bumps (recompiles)
    losses = [float(x) for x in open(tmp_path / "o" / "loss.txt")]
    assert len(losses) == 6 and all(np.isfinite(x) for x in losses)


def test_depth_supervision_trains(tiny_dataset, tmp_path):
    """--lambda-depth end to end (VERDICT r1 item 9): the depth term carries
    nonzero gradients to the positions, and a depth-supervised run ends with
    LOWER depth error than the same run without the term.  (An absolute
    before/after decrease is confounded by the iteration-0 opacity reset,
    which collapses the depth accumulation for both runs.)"""
    import jax
    import jax.numpy as jnp

    from gstpu.data.nerf import NerfSyntheticDataset
    from gstpu.ops.losses import depth_loss
    from gstpu.ops.rasterize import render
    from gstpu.trainer import Trainer

    data = NerfSyntheticDataset(str(tiny_dataset), "train")
    assert data.has_depth

    cfg = _config().replace(num_iterations=30, lambda_depth=4.0,
                            densify_from_iter=10_000)  # isolate the loss path

    def depth_l1(trainer):
        vals = []
        for i in range(len(data)):
            cam = data.camera(i)
            _, d = trainer._render_eval(
                trainer._settings(), trainer.model,
                jnp.asarray(cam["world_to_camera"]),
                jnp.asarray(cam["full_proj_matrix"]),
                jnp.asarray(cam["camera_center"]))
            td, m = data.depth(i)
            vals.append(float(depth_loss(d, cfg.depth_scale * jnp.asarray(td),
                                         jnp.asarray(m))))
        return np.mean(vals)

    trainer = Trainer(str(tiny_dataset), str(tmp_path / "d"), cfg)

    # nonzero depth gradients through the full render VJP
    cam = data.camera(0)
    td, m = data.depth(0)
    model = trainer.model
    s = trainer._settings(0)

    def dterm(pos):
        _, d, _ = render(s, trainer.tan_fovx, trainer.tan_fovy, 1.0, pos,
                         model.scales, model.rotations, model.opacities,
                         model.shs, jnp.asarray(cam["world_to_camera"]),
                         jnp.asarray(cam["full_proj_matrix"]),
                         jnp.asarray(cam["camera_center"]),
                         jnp.zeros(3, jnp.float32), model.alive, jnp.int32(0))
        return depth_loss(d, jnp.asarray(td), jnp.asarray(m))

    gnorm = float(jnp.linalg.norm(jax.grad(dterm)(model.positions)))
    assert gnorm > 1e-6, gnorm

    trainer.train()
    t0 = Trainer(str(tiny_dataset), str(tmp_path / "d0"),
                 cfg.replace(lambda_depth=0.0))
    t0.train()
    sup, unsup = depth_l1(trainer), depth_l1(t0)
    assert sup < unsup, (sup, unsup)


def test_depth_requires_depth_files(tmp_path):
    """Loud failure when lambda_depth is set but the split has no depth
    PNGs."""
    import shutil

    from scripts.make_tiny_nerf import make_dataset

    from gstpu.trainer import Trainer

    path = tmp_path / "nodepth"
    make_dataset(path, size=32, n_train=2, n_val=1)
    for p in path.glob("*/*_depth_*.png"):
        p.unlink()
    with pytest.raises(FileNotFoundError):
        Trainer(str(path), str(tmp_path / "o"),
                _config().replace(lambda_depth=0.5))
    shutil.rmtree(path)


def test_activated_parameterization_trains(tiny_dataset, tmp_path):
    """Official-3DGS parameterization (exp scales / sigmoid opacities) with
    the SSIM objective: stored values are logs/logits, render values match
    the raw init, and a short run trains with finite losses."""
    import jax
    import jax.numpy as jnp

    from gstpu.densify import reset_opacities
    from gstpu.models.gaussians import activate_params, init_model
    from gstpu.trainer import Trainer

    cfg = _config().replace(parameterization="activated", lambda_dssim=0.2)
    m = init_model(jax.random.PRNGKey(0), cfg)
    act = activate_params(m.param_dict(), "activated")
    np.testing.assert_allclose(np.asarray(act["scales"]), 0.1, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(act["opacities"]), 0.1, rtol=1e-5)

    # activated reset = official min(op, value) in render space
    m2 = reset_opacities(m, 0.01, "activated")
    act2 = activate_params(m2.param_dict(), "activated")
    np.testing.assert_allclose(np.asarray(act2["opacities"])[0], 0.01,
                               rtol=1e-4)
    m3 = reset_opacities(m2, 0.5, "activated")  # min: stays at 0.01
    act3 = activate_params(m3.param_dict(), "activated")
    np.testing.assert_allclose(np.asarray(act3["opacities"])[0], 0.01,
                               rtol=1e-4)

    out = tmp_path / "act"
    trainer = Trainer(str(tiny_dataset), str(out), cfg)
    trainer.train()
    losses = [float(x) for x in open(out / "loss.txt")]
    assert len(losses) == cfg.num_iterations
    assert all(np.isfinite(x) for x in losses)
    # stored scales stay in log space (negative for sub-unit scales)
    alive = np.asarray(trainer.model.alive)
    assert np.asarray(trainer.model.scales)[alive].mean() < 0.0


def test_overflow_rollback_replays_window(tiny_dataset, tmp_path):
    """Pair-list overflow rolls the window back to its snapshot and replays
    at grown capacity (round-2; replaces 'keep up to flush_interval
    corrupted updates').  The replayed run's losses must match a run that
    had ample capacity from the start (same seeds, same cameras)."""
    from gstpu.trainer import Trainer

    # many large splats at 32x32 (2x2 tile grid): 16k points x up to 4 tiles
    # each -> pairs can exceed the 32k starting capacity
    cfg = _config().replace(num_points=16384, initial_scale=1.0,
                            pair_capacity_per_gaussian=1.0,
                            densify_from_iter=10_000)

    out = tmp_path / "small"
    tr = Trainer(str(tiny_dataset), str(out), cfg)
    assert tr._pair_capacity == 1 << 15
    tr.train()
    metrics = [json.loads(line) for line in open(out / "metrics.jsonl")]
    overflows = [m for m in metrics if m.get("event") == "pair_overflow"]
    assert overflows and all(m["rolled_back"] for m in overflows)
    grows = [m for m in metrics if m.get("event") == "pair_capacity_grow"]
    assert grows and grows[-1]["capacity"] > 1 << 15

    out2 = tmp_path / "ample"
    cfg2 = cfg.replace(pair_capacity_per_gaussian=8.0)
    tr2 = Trainer(str(tiny_dataset), str(out2), cfg2)
    tr2.train()

    a = [float(x) for x in open(out / "loss.txt")]
    b = [float(x) for x in open(out2 / "loss.txt")]
    assert len(a) == len(b) == cfg.num_iterations
    np.testing.assert_allclose(a, b, rtol=2e-4)


def test_trainer_pallas_path_matches_xla(tiny_dataset, tmp_path):
    """The trainer's use_pallas path (interpret mode on CPU) must reproduce
    the XLA path's training dynamics through capacity refits and densify
    events — the kernels read the sorted pair list in place, so this also
    exercises head masking and boundary-chunk merging on real tile layouts."""
    from gstpu.trainer import Trainer

    cfg = _config()
    losses = {}
    for name, pallas in (("xla", False), ("pallas", True)):
        out = tmp_path / name
        tr = Trainer(str(tiny_dataset), str(out), cfg, use_pallas=pallas,
                     pallas_interpret=pallas)
        tr.train(flush_interval=3)
        losses[name] = [float(x) for x in open(out / "loss.txt")]
    assert len(losses["xla"]) == len(losses["pallas"]) == cfg.num_iterations
    np.testing.assert_allclose(losses["pallas"], losses["xla"], rtol=1e-4)

"""Adam + LR-scheduler parity with the reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from gstpu.config import GSConfig
from gstpu.optim import AdamState, adam_step, init_adam_state, schedule_lrs
from gstpu.scheduler import LRScheduler


def _numpy_adam_reference(params, grads, m, v, lrs, it, cfg):
    """Loop transcription of the fused adam_update kernel (optimizer.py:6-139)."""
    b1, b2, eps = cfg.adam_beta1, cfg.adam_beta2, cfg.adam_epsilon
    bc1 = 1.0 - b1 ** (it + 1)
    bc2 = 1.0 - b2 ** (it + 1)
    out_p, out_m, out_v = {}, {}, {}
    for k in params:
        g = grads[k]
        m_k = b1 * m[k] + (1 - b1) * g
        v_k = b2 * v[k] + (1 - b2) * g * g
        upd = lrs[k] * (m_k / bc1) / (np.sqrt(v_k / bc2) + eps)
        p = params[k] - upd
        out_p[k], out_m[k], out_v[k] = p, m_k, v_k
    # projections
    out_p["scales"] = np.maximum(out_p["scales"], 0.001)
    q = out_p["rotations"]
    qlen = np.linalg.norm(q, axis=-1, keepdims=True)
    out_p["rotations"] = np.where(qlen > 0, q / np.where(qlen == 0, 1, qlen), q)
    out_p["opacities"] = np.clip(out_p["opacities"], 0.0, 1.0)
    return out_p, out_m, out_v


def _random_params(rng, n=32):
    return {
        "positions": rng.normal(0, 1, (n, 3)).astype(np.float32),
        "scales": rng.uniform(0.01, 1, (n, 3)).astype(np.float32),
        "rotations": rng.normal(0, 1, (n, 4)).astype(np.float32),
        "opacities": rng.uniform(0, 1, n).astype(np.float32),
        "shs": rng.normal(0, 0.1, (n, 16, 3)).astype(np.float32),
    }


def test_adam_step_matches_reference_semantics():
    cfg = GSConfig()
    rng = np.random.default_rng(0)
    params = _random_params(rng)
    grads = {k: rng.normal(0, 0.05, v.shape).astype(np.float32)
             for k, v in params.items()}
    state = init_adam_state({k: jnp.asarray(v) for k, v in params.items()})
    it = 7
    lrs = schedule_lrs(cfg, jnp.int32(it))
    new_p, new_state = adam_step({k: jnp.asarray(v) for k, v in params.items()},
                                 {k: jnp.asarray(v) for k, v in grads.items()},
                                 state, lrs, jnp.int32(it), cfg)
    lrs_np = {"positions": float(lrs.positions), "scales": float(lrs.scales),
              "rotations": float(lrs.rotations),
              "opacities": float(lrs.opacities), "shs": float(lrs.shs)}
    ref_p, ref_m, ref_v = _numpy_adam_reference(
        params, grads, {k: np.zeros_like(v) for k, v in params.items()},
        {k: np.zeros_like(v) for k, v in params.items()}, lrs_np, it, cfg)
    for k in params:
        np.testing.assert_allclose(np.asarray(new_p[k]), ref_p[k],
                                   rtol=1e-5, atol=1e-7, err_msg=k)
        np.testing.assert_allclose(np.asarray(new_state.m[k]), ref_m[k],
                                   rtol=1e-5, atol=1e-8)


def test_adam_respects_alive_mask():
    cfg = GSConfig()
    rng = np.random.default_rng(1)
    params = {k: jnp.asarray(v) for k, v in _random_params(rng, 16).items()}
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    alive = jnp.arange(16) < 8
    state = init_adam_state(params)
    new_p, _ = adam_step(params, grads, state, schedule_lrs(cfg, 0),
                         jnp.int32(0), cfg, alive=alive)
    for k in params:
        dead_new = np.asarray(new_p[k])[8:]
        dead_old = np.asarray(params[k])[8:]
        np.testing.assert_array_equal(dead_new, dead_old)
        assert not np.allclose(np.asarray(new_p[k])[:8],
                               np.asarray(params[k])[:8])


def test_lr_scheduler_matches_reference_formula():
    # reference scheduler.py:15-28
    sched = LRScheduler(1e-2, 0.01)
    total = 7000
    for it in [0, 1, 100, 3500, 6999, 7500]:
        progress = min(it / (total - 1), 1.0)
        expected = 1e-2 * (0.01 ** progress)
        assert abs(sched.get_lr(it, total) - expected) < 1e-9 * max(expected, 1)
    assert sched.get_lr(5, 1) == 1e-2  # total<=1 short-circuit


def test_quaternion_renormalized_and_clamps():
    cfg = GSConfig()
    params = {
        "positions": jnp.zeros((4, 3)),
        "scales": jnp.full((4, 3), 0.0005),
        "rotations": jnp.asarray([[0, 0, 0, 1.]] * 4),
        "opacities": jnp.asarray([0.0, 1.0, 0.5, 0.2]),
        "shs": jnp.zeros((4, 16, 3)),
    }
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    grads["opacities"] = jnp.asarray([1.0, -1.0, 0.0, 0.0]) * 1e6
    new_p, _ = adam_step(params, grads, init_adam_state(params),
                         schedule_lrs(cfg, 0), jnp.int32(0), cfg)
    assert np.all(np.asarray(new_p["scales"]) >= 0.001)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(new_p["rotations"]), axis=-1), 1.0,
        rtol=1e-6)
    o = np.asarray(new_p["opacities"])
    assert o.min() >= 0.0 and o.max() <= 1.0

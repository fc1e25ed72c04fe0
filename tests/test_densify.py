"""Densification policy under fixed capacity (clone/split/prune + masks)."""

import jax
import jax.numpy as jnp
import numpy as np

from gstpu.config import GSConfig
from gstpu.densify import (compact, densify_and_prune, reset_opacities,
                           should_reset_opacity)
from gstpu.models.gaussians import grow_capacity, init_model


def _model(n=8, capacity=32, cfg=None):
    cfg = cfg or GSConfig(num_points=n)
    return init_model(jax.random.PRNGKey(0), cfg, capacity=capacity), cfg


def test_clone_small_high_grad():
    model, cfg = _model()
    cfg = cfg.replace(min_valid_points=1)  # prune guard off for tiny scenes
    # gaussian 0: high grad + small scale -> clone
    grads = np.zeros((32, 3), np.float32)
    grads[0] = 1.0
    model = model.replace(scales=model.scales.at[:].set(0.001))
    new, stats = densify_and_prune(model, jnp.asarray(grads), 10.0, cfg,
                                   jax.random.PRNGKey(1))
    assert int(stats.n_cloned) == 1
    assert int(stats.n_split) == 0
    assert int(new.n_alive) == 9
    # clone position is near the original (noise in [0, 0.01))
    d = np.abs(np.asarray(new.positions[8]) - np.asarray(model.positions[0]))
    assert np.all(d <= 0.01) and np.all(d >= 0)


def test_split_large_high_grad_removes_original():
    model, cfg = _model()
    cfg = cfg.replace(min_valid_points=1)
    grads = np.zeros((32, 3), np.float32)
    grads[2] = 1.0
    scales = np.full((32, 3), 0.001, np.float32)
    scales[2] = 0.5  # large vs percent_dense * extent = 0.01 * 10 = 0.1
    model = model.replace(scales=jnp.asarray(scales))
    orig_pos = np.asarray(model.positions[2])
    new, stats = densify_and_prune(model, jnp.asarray(grads), 10.0, cfg,
                                   jax.random.PRNGKey(1))
    assert int(stats.n_split) == 2          # two children appended
    assert int(new.n_alive) == 9            # 8 - 1 original + 2 children
    pos = np.asarray(new.positions[:9])
    scl = np.asarray(new.scales[:9])
    children = np.where(np.isclose(scl.max(-1), 0.4))[0]  # 0.5 * 0.8
    assert len(children) == 2
    assert np.all(np.abs(pos[children] - orig_pos) <= 0.011)


def test_prune_low_opacity_with_guards():
    model, cfg = _model()
    cfg = cfg.replace(min_valid_points=1)
    opac = np.full(32, 0.5, np.float32)
    opac[3] = 0.001  # below cull threshold 0.005
    model = model.replace(opacities=jnp.asarray(opac))
    new, stats = densify_and_prune(model, jnp.zeros((32, 3)), 10.0, cfg,
                                   jax.random.PRNGKey(1))
    assert int(stats.n_pruned) == 1
    assert int(new.n_alive) == 7
    assert bool(stats.changed)


def test_prune_guard_min_valid_points():
    model, cfg = _model()  # default min_valid_points=1000 >> 8
    opac = np.full(32, 0.001, np.float32)
    model = model.replace(opacities=jnp.asarray(opac))
    new, stats = densify_and_prune(model, jnp.zeros((32, 3)), 10.0, cfg,
                                   jax.random.PRNGKey(1))
    assert int(stats.n_pruned) == 0  # guard blocked pruning (train.py:651-654)
    assert int(new.n_alive) == 8


def test_official_split_sampling():
    """Opt-in official 3DGS split: children sampled from the parent's own
    Gaussian (spread ~ parent scale, not +-0.01) and scales divided by
    0.8 * split_n; reference jitter stays the default."""
    model, cfg = _model()
    cfg = cfg.replace(min_valid_points=1, official_split_sampling=True)
    grads = np.zeros((32, 3), np.float32)
    grads[2] = 1.0
    scales = np.full((32, 3), 0.001, np.float32)
    scales[2] = 0.5
    model = model.replace(scales=jnp.asarray(scales))
    orig_pos = np.asarray(model.positions[2])
    new, stats = densify_and_prune(model, jnp.asarray(grads), 10.0, cfg,
                                   jax.random.PRNGKey(1))
    assert int(stats.n_split) == 2 and int(new.n_alive) == 9
    scl = np.asarray(new.scales[:9])
    children = np.where(np.isclose(scl.max(-1), 0.5 / 1.6))[0]
    assert len(children) == 2
    d = np.abs(np.asarray(new.positions[:9])[children] - orig_pos)
    # sampled from N(0, 0.5): children land well outside the +-0.011
    # envelope of the reference jitter with overwhelming probability
    assert d.max() > 0.05
    # activated scheme: same children in render space (log storage)
    cfg_a = cfg.replace(parameterization="activated")
    model_a = model.replace(scales=jnp.log(model.scales),
                            opacities=jnp.full((32,), 0.0, jnp.float32))
    new_a, stats_a = densify_and_prune(model_a, jnp.asarray(grads), 10.0,
                                       cfg_a, jax.random.PRNGKey(1))
    assert int(stats_a.n_split) == 2
    scl_a = np.exp(np.asarray(new_a.scales[:9]))
    assert np.isclose(scl_a.max(-1), 0.5 / 1.6).sum() == 2


def test_q16_last_index_quirk_semantics():
    """q16_last_index replicates the reference's exclusive-scan count
    off-by-one (GSConfig Q16, train.py:433/497/581/641): the last element
    never clones, a split event drops its final appended child, a
    split-masked final element vanishes childless, and an engaged prune
    drops the final surviving Gaussian."""
    # 1. last element clone-masked -> no clone happens at all
    model, cfg = _model()
    cfg = cfg.replace(min_valid_points=1, q16_last_index=True)
    grads = np.zeros((32, 3), np.float32)
    grads[7] = 1.0                       # last alive (n_alive=8) index 7
    m = model.replace(scales=model.scales.at[:].set(0.001))
    new, stats = densify_and_prune(m, jnp.asarray(grads), 10.0, cfg,
                                   jax.random.PRNGKey(1))
    assert int(stats.n_cloned) == 0
    # prune engages (all survive, q16 forces valid_count < num_points) and
    # drops the final survivor: 8 -> 7
    assert int(stats.n_pruned) == 1 and int(new.n_alive) == 7

    # 2. split event: masked elements 2 and 7 (the final one) -> element 2
    # splits into 2 children, element 7 vanishes childless, the final
    # appended child is dropped -> alive = 8 - 2 originals + 1 child,
    # then the engaged prune drops the final survivor
    grads = np.zeros((32, 3), np.float32)
    grads[2] = grads[7] = 1.0
    scales = np.full((32, 3), 0.001, np.float32)
    scales[2] = scales[7] = 0.5
    m = model.replace(scales=jnp.asarray(scales))
    new, stats = densify_and_prune(m, jnp.asarray(grads), 10.0, cfg,
                                   jax.random.PRNGKey(1))
    assert int(stats.n_split) == 1       # 2 appended, final one dropped
    assert int(new.n_alive) == 6         # 8 - 2 + 1 - 1(prune quirk)

    # 3. ONLY the final element split-masked -> eff total 0 -> whole split
    # block skipped, element stays; prune quirk still drops the final
    grads = np.zeros((32, 3), np.float32)
    grads[7] = 1.0
    m = model.replace(scales=jnp.asarray(
        np.where(np.arange(32)[:, None] == 7, 0.5, 0.001).astype(np.float32)))
    new, stats = densify_and_prune(m, jnp.asarray(grads), 10.0, cfg,
                                   jax.random.PRNGKey(1))
    assert int(stats.n_split) == 0
    assert int(new.n_alive) == 7

    # 4. default config: exact counts, no quirk
    cfg0 = cfg.replace(q16_last_index=False)
    new, stats = densify_and_prune(m, jnp.asarray(grads), 10.0, cfg0,
                                   jax.random.PRNGKey(1))
    assert int(stats.n_split) == 2 and int(new.n_alive) == 9
    assert int(stats.n_pruned) == 0


def test_capacity_overflow_reported():
    model, cfg = _model(n=8, capacity=9)
    cfg = cfg.replace(min_valid_points=1)
    grads = np.ones((9, 3), np.float32)  # everything wants to clone
    model = model.replace(scales=model.scales.at[:].set(0.001))
    new, stats = densify_and_prune(model, jnp.asarray(grads), 10.0, cfg,
                                   jax.random.PRNGKey(1))
    assert int(stats.overflow) > 0
    assert int(new.n_alive) <= 9


def test_compact_preserves_order_and_values():
    model, cfg = _model(n=8, capacity=16)
    alive = np.zeros(16, bool)
    alive[[1, 3, 6]] = True
    model = model.replace(alive=jnp.asarray(alive))
    c = compact(model)
    assert int(c.n_alive) == 3
    np.testing.assert_array_equal(np.asarray(c.positions[:3]),
                                  np.asarray(model.positions)[[1, 3, 6]])
    assert np.all(np.asarray(c.alive[:3]))
    assert not np.any(np.asarray(c.alive[3:]))


def test_opacity_reset_all_alive():
    model, cfg = _model()
    new = reset_opacities(model, 0.01)
    assert np.allclose(np.asarray(new.opacities[:8]), 0.01)
    # dead slots untouched
    np.testing.assert_array_equal(np.asarray(new.opacities[8:]),
                                  np.asarray(model.opacities[8:]))


def test_opacity_reset_trigger():
    cfg = GSConfig()
    assert should_reset_opacity(cfg, 3000)
    assert should_reset_opacity(cfg, 6000)
    assert not should_reset_opacity(cfg, 500)  # black bg: not at from_iter
    white = cfg.replace(background_color=(1.0, 1.0, 1.0))
    assert should_reset_opacity(white, 500)   # white bg: reset at from_iter

    # official-3DGS gating (opt-in): no resets at/after the cutoff —
    # the reference's unconditional late resets cost ~1k-iteration
    # recoveries on long schedules (round-5 30k run)
    gated = cfg.replace(opacity_reset_until_iter=15000)
    assert should_reset_opacity(gated, 12000)
    assert not should_reset_opacity(gated, 15000)
    assert not should_reset_opacity(gated, 18000)
    assert not should_reset_opacity(gated, 27000)


def test_grow_capacity_preserves_state():
    model, cfg = _model(n=8, capacity=16)
    g = grow_capacity(model, 64)
    assert g.capacity == 64
    assert int(g.n_alive) == 8
    np.testing.assert_array_equal(np.asarray(g.positions[:16]),
                                  np.asarray(model.positions))
    assert not np.any(np.asarray(g.alive[16:]))

"""Adaptive densification: clone / split / prune under fixed capacity.

Functional port of the reference policy (train.py:351-714 + the kernels in
optimizer.py:143-416) to static shapes: the reference's
mask → scan → host-readback → realloc → scatter sequence becomes masked
scatters within a fixed-capacity array (SURVEY §7.2.2).  Appends that would
exceed capacity are dropped and reported via ``DensifyStats.overflow`` — the
trainer grows capacity (the only recompile event) and re-runs.

Replicated reference behaviors (SURVEY §7.1):
- Q4: densification thresholds use the *instantaneous* position gradients of
  the current step (train.py:394-408), not an accumulated average.
- Q5: any topology change resets the Adam moments (and grads) to zero
  (train.py:474-476 etc.) — the caller does this when ``stats.changed``.
- Q6: opacity reset sets ALL opacities to the reset value unconditionally
  (optimizer.py:155-158), not min(op, value).
- Q14 (new): the reference launches ``mark_split_candidates`` over the
  *post-clone* count while the gradient array still has the pre-clone size
  (train.py:479-492) — an out-of-bounds read.  We define freshly cloned
  Gaussians to have zero gradient (they never split in the same event).

Split children: 2 per original, scales x 0.8, position jitter U(-0.01, 0.01);
clone noise U(0, 0.01) (optimizer.py:285-309, 342-362); originals of splits
are removed (train.py:544-619).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gstpu.config import GSConfig
from gstpu.models.gaussians import GaussianModel


class DensifyStats(NamedTuple):
    changed: jnp.ndarray    # () bool — topology changed (reset Adam state)
    n_cloned: jnp.ndarray   # () int32
    n_split: jnp.ndarray    # () int32
    n_pruned: jnp.ndarray   # () int32
    overflow: jnp.ndarray   # () int32 — appends dropped for lack of capacity
    n_alive: jnp.ndarray    # () int32 after the event


def clone_position_noise(key, n: int, scale) -> jnp.ndarray:
    """(n, 3) noise added to cloned positions: U(0, scale).

    Module-level hook: the reference keys its clone noise by SOURCE index
    (optimizer.py:350-352, ``randf(i*3+k) * scale``); parity harnesses
    monkeypatch this (together with the warp shim's ``randf``) with the same
    index-keyed hash so both sides produce bit-equal clones.  Row i here IS
    source index i — ``_append_masked`` scatters row i to clone(i)."""
    return jax.random.uniform(key, (n, 3), jnp.float32, 0.0, scale)


def split_position_jitter(key, target_idx, scale) -> jnp.ndarray:
    """(n, 3) jitter for split children: U(-scale, scale).

    Module-level hook like :func:`clone_position_noise`; the reference keys
    split jitter by TARGET index (optimizer.py:295-299,
    ``(randf(new_idx*3+k)*2-1) * 0.01``) — ``target_idx[i]`` is child i's
    post-append slot, identical numbering to the reference's ``new_idx``."""
    return jax.random.uniform(key, (target_idx.shape[0], 3), jnp.float32,
                              -scale, scale)


def _append_masked(model: GaussianModel, mask, make_new, n_copies: int,
                   key) -> tuple[GaussianModel, jnp.ndarray, jnp.ndarray]:
    """Append ``n_copies`` derived Gaussians for every masked entry.

    ``make_new(params_of_source, copy_index, key, target)`` returns the
    derived param dict (``target[i]`` = destination slot of source i's copy,
    ``capacity`` = drop sentinel).  Returns (model, n_appended, overflow).
    """
    cap = model.capacity
    cum = jnp.cumsum(mask.astype(jnp.int32))
    total = cum[-1]
    base = model.n_alive + (cum - 1) * n_copies
    new = model
    for c in range(n_copies):
        target = jnp.where(mask, base + c, cap)  # cap == drop sentinel
        derived = make_new(model.param_dict(), c,
                           jax.random.fold_in(key, c), target)
        updates = {}
        for k, val in derived.items():
            arr = getattr(new, k)
            updates[k] = arr.at[target].set(val, mode="drop")
        alive = new.alive.at[target].set(True, mode="drop")
        new = new.replace(**updates, alive=alive)
    want = total * n_copies
    # number actually written: entries with base + c < cap
    appended = jnp.sum(jnp.where(mask, jnp.clip(cap - base, 0, n_copies), 0))
    new = new.replace(n_alive=model.n_alive + appended)
    return new, appended, want - appended


def compact(model: GaussianModel) -> GaussianModel:
    """Stable-compact live Gaussians to the front (optimizer.py:384-416)."""
    order = jnp.argsort(jnp.logical_not(model.alive), stable=True)
    n_alive = jnp.sum(model.alive.astype(jnp.int32))

    def take(x):
        return jnp.take(x, order, axis=0)

    return model.replace(
        positions=take(model.positions), scales=take(model.scales),
        rotations=take(model.rotations), opacities=take(model.opacities),
        shs=take(model.shs), alive=take(model.alive), n_alive=n_alive)


def densify_and_prune(model: GaussianModel, pos_grads: jnp.ndarray,
                      scene_extent: float, config: GSConfig,
                      key: jax.Array) -> tuple[GaussianModel, DensifyStats]:
    """One densification event (train.py:392-693).  Jittable, static shapes."""
    cap = model.capacity
    activated = config.parameterization == "activated"
    grad_norms = jnp.linalg.norm(pos_grads, axis=-1) * model.alive
    # thresholds compare RENDER-space scales/opacities in both schemes
    real_scales = jnp.exp(model.scales) if activated else model.scales
    max_scale = jnp.max(real_scales, axis=-1)
    scale_thresh = config.percent_dense * scene_extent
    high_grad = grad_norms >= config.densify_grad_threshold

    # --- step 1: clone small Gaussians (train.py:414-476) ---
    clone_mask = model.alive & high_grad & (max_scale <= scale_thresh)
    idx = jnp.arange(cap, dtype=jnp.int32)
    if config.q16_last_index:
        # Q16 (config.py): total_to_clone excludes the final element's mask
        # bit (train.py:433) and its clone write is OOB-dropped — the last
        # pre-clone element never clones
        clone_mask = clone_mask & (idx != model.n_alive - 1)
    k_clone, k_split = jax.random.split(key)

    def make_clone(p, _c, k, _target):
        noise = clone_position_noise(k, p["positions"].shape[0],
                                     config.clone_noise_scale)
        return {**p, "positions": p["positions"] + noise}

    model1, n_cloned, ovf1 = _append_masked(model, clone_mask, make_clone, 1,
                                            k_clone)

    # --- step 2: split large Gaussians (train.py:478-619) ---
    # Q14: clones have zero gradient, so the split mask equals the pre-clone
    # mask over originals; clones (appended past the old n_alive) never split.
    split_mask = model.alive & high_grad & (max_scale > scale_thresh)

    def make_child(p, c, k, target):
        if config.official_split_sampling:
            # Official 3DGS split: each child is SAMPLED from the parent's
            # own Gaussian (N(0, S) rotated by the parent's R), and child
            # scales divide by 0.8 * split_n.  Far better conditioned than
            # the reference's +-clone_noise_scale uniform jitter for large
            # Gaussians (whose extent >> 0.01); opt-in so the
            # reference-parity behavior stays the default.
            from gstpu.ops.math3d import quat_to_rotmat
            real_s = jnp.exp(p["scales"]) if activated else p["scales"]
            eps = jax.random.normal(k, p["positions"].shape, jnp.float32)
            R = quat_to_rotmat(p["rotations"])          # (N, 3, 3)
            jitter = jnp.einsum("nij,nj->ni", R, eps * real_s)
            factor = 1.0 / (0.8 * config.split_n)
            if activated:
                child_scales = p["scales"] + jnp.log(jnp.float32(factor))
            else:
                child_scales = p["scales"] * factor
        else:
            jitter = split_position_jitter(k, target,
                                           config.clone_noise_scale)
            if activated:  # x factor in render space == + log in logs
                child_scales = p["scales"] + jnp.log(
                    jnp.float32(config.split_scale_factor))
            else:
                child_scales = p["scales"] * config.split_scale_factor
        return {**p,
                "positions": p["positions"] + jitter,
                "scales": child_scales}

    if config.q16_last_index:
        # Q16: total_to_split excludes the post-clone array's final
        # element's mask bit (train.py:497).  If that leaves zero, the
        # whole split block is skipped (nothing removed either); otherwise
        # a split-masked final element gets no children (OOB writes) but IS
        # removed (train.py:556-558 marks it), and the compaction count
        # (train.py:581) excludes the final appended child, which the
        # step-2 compact then drops.
        last1 = model1.n_alive - 1
        eff = jnp.sum(split_mask.astype(jnp.int32)) \
            - split_mask[last1].astype(jnp.int32)
        do_split = eff > 0
        child_src = split_mask & (idx != last1) & do_split
        remove_mask = split_mask & do_split
        model2, n_children, ovf2 = _append_masked(
            model1, child_src, make_child, config.split_n, k_split)
        last_child = model1.n_alive + config.split_n * eff - 1
        drop_last_child = do_split & (n_children > 0)
        model2 = model2.replace(
            alive=model2.alive & jnp.logical_not(remove_mask)
            & ((idx != last_child) | ~drop_last_child),
            n_alive=model2.n_alive - drop_last_child.astype(jnp.int32))
        n_children = n_children - drop_last_child.astype(jnp.int32)
    else:
        model2, n_children, ovf2 = _append_masked(
            model1, split_mask, make_child, config.split_n, k_split)
        # remove split originals, then compact (train.py:544-619)
        model2 = model2.replace(
            alive=model2.alive & jnp.logical_not(split_mask))
    model2 = compact(model2)

    # --- step 3: prune by opacity with guards (train.py:621-693) ---
    real_opac = (jax.nn.sigmoid(model2.opacities) if activated
                 else model2.opacities)
    keep = model2.alive & (real_opac > config.cull_opacity_threshold)
    valid_count = jnp.sum(keep.astype(jnp.int32))
    num_points = model2.n_alive
    if config.q16_last_index:
        # Q16: valid_count excludes the final element's keep bit
        # (train.py:641) and compact_gaussians' write for a surviving final
        # element is OOB-dropped — so the guards see the undercount, the
        # `valid_count < num_points` gate passes whenever the final element
        # survives (even with zero true prune candidates), and an engaged
        # prune always drops the final surviving Gaussian.
        valid_count = valid_count \
            - keep[model2.n_alive - 1].astype(jnp.int32)
        keep = keep & (idx != model2.n_alive - 1)
    prune_count = num_points - valid_count
    prune_ratio = prune_count.astype(jnp.float32) / jnp.maximum(
        num_points.astype(jnp.float32), 1.0)
    do_prune = ((valid_count >= config.min_valid_points)
                & (valid_count <= config.max_valid_points)
                & (prune_ratio <= config.max_allowed_prune_ratio)
                & (valid_count < num_points))
    pruned_model = compact(model2.replace(alive=keep))
    model3 = jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            do_prune.reshape((-1,) + (1,) * (a.ndim - 1))[0]
            if a.ndim else do_prune, a, b),
        pruned_model, model2)
    n_pruned = jnp.where(do_prune, prune_count, 0)

    changed = (n_cloned > 0) | (n_children > 0) | (n_pruned > 0)
    stats = DensifyStats(changed=changed, n_cloned=n_cloned,
                         n_split=n_children, n_pruned=n_pruned,
                         overflow=ovf1 + ovf2, n_alive=model3.n_alive)
    return model3, stats


def reset_opacities(model: GaussianModel, value: float,
                    parameterization: str = "raw") -> GaussianModel:
    """Opacity reset.  Raw scheme: unconditional set-all (Q6,
    optimizer.py:143-158).  Activated scheme: official 3DGS semantics —
    min(opacity, value) in render space, stored as a logit."""
    if parameterization == "activated":
        from gstpu.models.gaussians import inverse_sigmoid

        new = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(model.opacities),
                                          jnp.float32(value)))
    else:
        new = jnp.float32(value)
    return model.replace(
        opacities=jnp.where(model.alive, new, model.opacities))


def should_reset_opacity(config: GSConfig, iteration: int) -> bool:
    """Opacity-reset trigger (train.py:696-701).

    The reference's ``0 % 3000 == 0`` also fires at iteration 0 (a quirk we
    replicate for the raw scheme); official 3DGS never resets at 0, and in
    the activated scheme an iteration-0 reset wipes the 0.1 init before any
    learning happens — skip it there."""
    white = all(c == 1.0 for c in config.background_color)
    if iteration == 0 and config.parameterization == "activated":
        return False
    if (config.opacity_reset_until_iter is not None
            and iteration >= config.opacity_reset_until_iter):
        return False  # official-3DGS gating, opt-in (see GSConfig)
    return (iteration % config.opacity_reset_interval == 0
            or (white and iteration == config.densify_from_iter))

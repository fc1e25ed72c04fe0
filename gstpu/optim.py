"""Fused Adam optimizer with per-group learning rates and parameter projections.

Pure-functional transcription of the reference's single fused ``adam_update``
kernel (optimizer.py:6-139):

- bias correction at ``iteration + 1`` (optimizer.py:47-48),
- scales floor-clamped at 0.001 after the step (optimizer.py:71-75; the
  reference uses raw parameters, not exp/sigmoid activations — Q2),
- quaternions renormalized post-step with a zero-length guard
  (optimizer.py:103-115),
- opacities clamped to [0, 1] (optimizer.py:126).

On TPU this is one fused elementwise XLA program over all parameter groups;
state shards with the parameters over the mesh.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from gstpu.config import GSConfig


@struct.dataclass
class AdamState:
    m: Dict[str, Any]
    v: Dict[str, Any]


class LRs(NamedTuple):
    positions: jnp.ndarray
    scales: jnp.ndarray
    rotations: jnp.ndarray
    opacities: jnp.ndarray
    shs: jnp.ndarray


def init_adam_state(params: Dict[str, Any]) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(m=zeros, v=jax.tree_util.tree_map(jnp.zeros_like, params))


def exp_lr(initial_lr: float, final_lr_factor: float, iteration,
           total_iterations: int):
    """Exponential decay schedule (reference scheduler.py:15-28)."""
    if total_iterations <= 1:
        return jnp.float32(initial_lr)
    progress = jnp.minimum(iteration / (total_iterations - 1), 1.0)
    return jnp.float32(initial_lr) * jnp.float32(final_lr_factor) ** progress


def schedule_lrs(config: GSConfig, iteration) -> LRs:
    """Per-group LRs at ``iteration`` (train.py:720-748)."""
    total = config.num_iterations
    if not config.use_lr_scheduler:
        return LRs(jnp.float32(config.lr_pos), jnp.float32(config.lr_scale),
                   jnp.float32(config.lr_rot), jnp.float32(config.lr_opac),
                   jnp.float32(config.lr_sh))
    f = config.final_lr_factor
    return LRs(
        positions=exp_lr(config.lr_pos, f, iteration, total),
        scales=exp_lr(config.lr_scale, f, iteration, total),
        rotations=exp_lr(config.lr_rot, f, iteration, total),
        opacities=(exp_lr(config.lr_opac, f, iteration, total)
                   if config.schedule_opac else jnp.float32(config.lr_opac)),
        shs=exp_lr(config.lr_sh, f, iteration, total),
    )


def _adam_core(p, g, m, v, lr, b1, b2, eps, bc1, bc2):
    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * g * g
    update = lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    return p - update, m, v


def adam_step(params: Dict[str, Any], grads: Dict[str, Any],
              state: AdamState, lrs: LRs, iteration,
              config: GSConfig, alive=None):
    """One fused Adam step over all five parameter groups.

    ``alive`` masks updates for capacity-padding slots (a no-op for live-only
    arrays: dead slots have zero grads and zero moments, but the projections
    below would otherwise modify them).
    """
    b1, b2, eps = config.adam_beta1, config.adam_beta2, config.adam_epsilon
    t = (iteration + 1).astype(jnp.float32) if hasattr(iteration, "astype") \
        else jnp.float32(iteration + 1)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    lr_of = {"positions": lrs.positions, "scales": lrs.scales,
             "rotations": lrs.rotations, "opacities": lrs.opacities,
             "shs": lrs.shs}
    new_p, new_m, new_v = {}, {}, {}
    for k in params:
        new_p[k], new_m[k], new_v[k] = _adam_core(
            params[k], grads[k], state.m[k], state.v[k], lr_of[k],
            b1, b2, eps, bc1, bc2)

    # --- projections (reference post-step constraints) ---
    if config.parameterization == "raw":
        # Q2: raw scheme clamps the stored values
        new_p["scales"] = jnp.maximum(new_p["scales"], 0.001)
        new_p["opacities"] = jnp.clip(new_p["opacities"], 0.0, 1.0)
    # official "activated" mode needs no clamps (exp/sigmoid keep the render
    # values in range); quaternions renormalize in both schemes
    q = new_p["rotations"]
    qlen = jnp.linalg.norm(q, axis=-1, keepdims=True)
    new_p["rotations"] = jnp.where(qlen > 0.0, q / jnp.where(qlen == 0, 1.0, qlen), q)

    if alive is not None:
        def _mask(new, old):
            m = alive.reshape((-1,) + (1,) * (new.ndim - 1))
            return jnp.where(m, new, old)
        new_p = jax.tree_util.tree_map(_mask, new_p, params)
        new_m = jax.tree_util.tree_map(_mask, new_m, state.m)
        new_v = jax.tree_util.tree_map(_mask, new_v, state.v)

    return new_p, AdamState(m=new_m, v=new_v)

"""The Gaussian point-cloud model: a fixed-capacity masked parameter pytree.

The reference stores exactly-N arrays and reallocates them on every
densification event (train.py:441-476 etc.).  Under XLA, runtime shape changes
force recompilation, so the TPU-native design (SURVEY §7.2.2) keeps arrays at a
static ``capacity`` with an ``alive`` mask and an ``n_alive`` count.  Alive
Gaussians are kept compacted at the front (indices [0, n_alive)), which makes
clone/split appends cheap and keeps the render's pair list free of dead
entries.  Capacity growth is the only recompile/reshard event.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from gstpu.config import GSConfig


@struct.dataclass
class GaussianModel:
    """Parameters of N (= capacity) Gaussians; [0, n_alive) are live."""

    positions: Any   # (C, 3) f32
    scales: Any      # (C, 3) f32 — raw (no exp activation; reference Q2)
    rotations: Any   # (C, 4) f32 quaternions (x, y, z, w)
    opacities: Any   # (C,)  f32 — raw-clamped [0, 1] (reference Q2)
    shs: Any         # (C, 16, 3) f32
    alive: Any       # (C,) bool
    n_alive: Any     # () int32

    @property
    def capacity(self) -> int:
        return self.positions.shape[0]

    def param_dict(self):
        return {"positions": self.positions, "scales": self.scales,
                "rotations": self.rotations, "opacities": self.opacities,
                "shs": self.shs}


def activate_params(params, parameterization: str):
    """Map stored parameters to render-space parameters.

    "raw" (reference Q2): identity.  "activated" (official 3DGS): scales are
    stored as logs (exp activation), opacities as logits (sigmoid).
    Gradients flow through the activations to the stored values.
    """
    if parameterization == "raw":
        return params
    if parameterization != "activated":
        raise ValueError(f"unknown parameterization {parameterization!r}")
    return {**params,
            "scales": jnp.exp(params["scales"]),
            "opacities": jax.nn.sigmoid(params["opacities"])}


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def init_model(key: jax.Array, config: GSConfig,
               capacity: int | None = None) -> GaussianModel:
    """Random initialization matching the reference recipe (train.py:36-92):

    - positions uniform in [-e, e]^3 (e = 1.3; Q8 — random init, not SfM),
    - isotropic scales = ``initial_scale``,
    - identity rotations — the *true* identity (0,0,0,1) under the (x,y,z,w)
      convention, fixing the reference's (1,0,0,0) trap (Q1, per SURVEY §7.1),
    - opacity 0.1, SH DC = -0.007, higher orders zero.
    """
    n = config.num_points
    if capacity is None:
        capacity = int(n * config.capacity_headroom)
    capacity = max(capacity, n)
    e = config.init_position_extent
    positions = jax.random.uniform(key, (capacity, 3), jnp.float32, -e, e)
    init_scale, init_opac = config.initial_scale, config.initial_opacity
    if config.parameterization == "activated":
        init_scale = float(jnp.log(jnp.float32(init_scale)))
        init_opac = float(inverse_sigmoid(jnp.float32(init_opac)))
    scales = jnp.full((capacity, 3), init_scale, jnp.float32)
    rotations = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32),
                         (capacity, 1))
    opacities = jnp.full((capacity,), init_opac, jnp.float32)
    shs = jnp.zeros((capacity, 16, 3), jnp.float32)
    shs = shs.at[:, 0, :].set(config.initial_sh_dc)
    alive = jnp.arange(capacity) < n
    return GaussianModel(positions=positions, scales=scales,
                         rotations=rotations, opacities=opacities, shs=shs,
                         alive=alive, n_alive=jnp.int32(n))


SH_C0 = 0.28209479177387814  # Y_00; matches ops/preprocess SH evaluation


def init_model_from_points(config: GSConfig, xyz, rgb,
                           capacity: int | None = None) -> GaussianModel:
    """SfM point-cloud initialization (official 3DGS recipe; beyond-
    reference — the reference only initializes at random, Q8):

    - positions at the SfM points,
    - isotropic scales = distance to the 3rd-ish nearest neighbor
      (sqrt of the mean squared distance to the 3 nearest, floored at
      1e-7 like the official ``distCUDA2`` clamp),
    - SH DC from the point color: (rgb - 0.5) / C0,
    - identity rotations, opacity = ``initial_opacity``.

    Runs on the host (NumPy/scipy) — init is a one-time event.
    """
    import numpy as np

    xyz = np.asarray(xyz, np.float32)
    rgb = np.asarray(rgb, np.float32)
    n = xyz.shape[0]
    if capacity is None:
        capacity = int(n * config.capacity_headroom)
    capacity = max(capacity, n)

    from scipy.spatial import cKDTree
    # k=4: the point itself plus its 3 nearest neighbors
    dists, _ = cKDTree(xyz).query(xyz, k=min(4, n))
    dist2 = np.maximum((dists[:, 1:] ** 2).mean(axis=1)
                       if n > 1 else np.full(n, 1e-4), 1e-7)
    scale = np.sqrt(dist2).astype(np.float32)

    init_opac = config.initial_opacity
    scales_n = np.tile(scale[:, None], (1, 3))
    if config.parameterization == "activated":
        scales_n = np.log(scales_n)
        init_opac = float(np.log(init_opac / (1.0 - init_opac)))

    positions = np.zeros((capacity, 3), np.float32)
    positions[:n] = xyz
    scales = np.full((capacity, 3), scales_n[0, 0] if n else 0.0, np.float32)
    scales[:n] = scales_n
    shs = np.zeros((capacity, 16, 3), np.float32)
    shs[:n, 0, :] = (rgb - 0.5) / SH_C0
    rotations = np.tile(np.asarray([0.0, 0.0, 0.0, 1.0], np.float32),
                        (capacity, 1))
    opacities = np.full((capacity,), init_opac, np.float32)
    alive = np.arange(capacity) < n
    return GaussianModel(
        positions=jnp.asarray(positions), scales=jnp.asarray(scales),
        rotations=jnp.asarray(rotations), opacities=jnp.asarray(opacities),
        shs=jnp.asarray(shs), alive=jnp.asarray(alive),
        n_alive=jnp.int32(n))


def grow_capacity(model: GaussianModel, new_capacity: int) -> GaussianModel:
    """Pad all arrays to a larger capacity (host-side recompile boundary)."""
    c = model.capacity
    assert new_capacity >= c
    pad = new_capacity - c

    def _pad(x):
        if x.ndim == 0:
            return x
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    return GaussianModel(
        positions=_pad(model.positions), scales=_pad(model.scales),
        rotations=_pad(model.rotations), opacities=_pad(model.opacities),
        shs=_pad(model.shs), alive=_pad(model.alive), n_alive=model.n_alive)

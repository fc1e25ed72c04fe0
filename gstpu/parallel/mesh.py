"""Device-mesh construction for multi-chip training.

Axes:
- ``data``  — camera batch (pure data parallelism; gradients psum here),
- ``model`` — Gaussian primitives for preprocess/Adam state AND image tile
  rows for rasterize (the two shardings share one axis: each device owns a
  Gaussian shard and a tile band; the forward all_gather of screen-space
  Gaussians is the binning exchange, its vjp is the reduce-scatter of the
  duplicated-Gaussian gradients — SURVEY §2.8).

The reference has no distributed layer at all (SURVEY §2.8); this module is
net-new and designed for ICI: the all_gather payload is the compact per-
Gaussian screen-space tuple, not the images.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_data: int | None = None, n_model: int | None = None,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults: all devices on the model axis (the rasterize/tile axis benefits
    most at single-scene scale).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None and n_model is None:
        n_data, n_model = 1, n
    elif n_data is None:
        n_data = n // n_model
    elif n_model is None:
        n_model = n // n_data
    assert n_data * n_model == n, (n_data, n_model, n)
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))

"""Sharded render / train step over a (data, model) mesh via shard_map.

Parallel decomposition (net-new vs the reference, which is single-device —
SURVEY §2.8):

- **parameters & Adam state** are sharded over ``model`` (axis 0 of every
  parameter array);
- **forward**: each device ``all_gather``s the parameters over ``model``
  (rides ICI), preprocesses all Gaussians, then builds pairs and rasterizes
  ONLY its own band of tile rows (``row0 = axis_index('model') * band_rows``)
  — the tile/pixel axis is the "sequence parallel" analog (SURVEY §5);
- **loss**: per-band partial L1 sums, ``psum`` over ('data', 'model');
- **backward**: the vjp of the all_gather is automatically a
  ``psum_scatter`` — the reduce-scatter of duplicated-Gaussian gradients the
  north-star asks for; camera-batch gradients are ``psum``'d over ``data``;
- **optimizer**: fused Adam runs on each shard independently (state sharded
  with parameters).

Batched multi-camera steps (one camera per data-group) are a new capability —
the reference trains one camera per step (train.py:928).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gstpu.config import GSConfig, RenderSettings, TILE_Y
from gstpu.optim import AdamState, adam_step, schedule_lrs
from gstpu.ops.rasterize import render


def band_settings(settings: RenderSettings, n_model: int) -> RenderSettings:
    """Per-device settings: device d rasterizes the ROUND-ROBIN tile rows
    {d + k*n_model : k in [0, ceil(grid_y/n_model))}.

    Strided rows, not contiguous bands: real scenes concentrate splats in the
    center rows, and contiguous bands measure 0.41 mean/max pair balance at
    8 devices on trained Lego vs 0.95+ for round-robin (PERF_NOTES.md).
    Rows past grid_y clip empty (clip_rect_to_band) and are masked/cropped by
    the callers."""
    import dataclasses
    rows = -(-settings.grid_y // n_model)
    # shard_axis: each device runs the per-Gaussian adjoint chain only for
    # its own slice (cotangents psum_scattered first; rasterize._render_bwd)
    return dataclasses.replace(settings, tile_rows=rows, row_stride=n_model,
                               shard_axis="model" if n_model > 1 else None)


def _gather_params(p_shard):
    return jax.tree_util.tree_map(
        lambda x: jax.lax.all_gather(x, "model", axis=0, tiled=True), p_shard)


def make_sharded_render(settings: RenderSettings, mesh: Mesh,
                        tan_fovx: float, tan_fovy: float,
                        scale_modifier: float = 1.0):
    """Multi-device render: returns fn(params_shard, alive_shard, view, proj,
    campos, bg) -> full (H, W, 3) image (replicated)."""
    n_model = mesh.shape["model"]
    bset = band_settings(settings, n_model)
    band_rows = bset.band_rows

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("model"), P("model"), P(), P(), P(), P()),
        out_specs=P("model"), check_vma=False)
    def _render(p_shard, alive_shard, view, proj, campos, bg):
        row0 = jax.lax.axis_index("model")      # round-robin: rows d + k*n
        p = _gather_params(p_shard)
        alive = jax.lax.all_gather(alive_shard, "model", axis=0, tiled=True)
        image_band, _, _ = render(
            bset, tan_fovx, tan_fovy, scale_modifier,
            p["positions"], p["scales"], p["rotations"], p["opacities"],
            p["shs"], view, proj, campos, bg, alive, row0)
        return image_band  # bands concatenate over rows (out_specs axis 0)

    def run(params_shard, alive_shard, view, proj, campos, bg):
        img = _render(params_shard, alive_shard, view, proj, campos, bg)
        # device d's band holds tile rows [d::n_model]: interleave them back
        w3 = img.shape[1:]
        img = img.reshape((n_model, band_rows, TILE_Y) + w3)
        img = jnp.swapaxes(img, 0, 1).reshape((n_model * band_rows * TILE_Y,)
                                              + w3)
        return img[:settings.height, :settings.width]

    return run


def make_sharded_train_step(settings: RenderSettings, config: GSConfig,
                            mesh: Mesh, tan_fovx: float, tan_fovy: float):
    """Multi-device train step.

    Returns fn(params_shard, adam_shard, alive_shard, views (B,4,4),
    projs (B,4,4), camposes (B,3), targets (B,H',W,3), iteration) ->
    (new_params_shard, new_adam_shard, loss, pos_grads_shard, num_pairs_max,
    iteration+1)

    ``B`` must equal the data-axis size; targets must be padded to
    H' = n_model * band_rows * 16 (``pad_targets_to_grid(..., n_model)``).
    """
    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]
    bset = band_settings(settings, n_model)
    band_rows = bset.band_rows
    bg = jnp.asarray(config.background_color, jnp.float32)
    height, width = settings.height, settings.width
    lambda_dssim = float(config.lambda_dssim)

    def _assemble_rows(bands):
        """(n_model*band_rows*16, W, 3) device-major gathered bands ->
        (H, W, 3) image (device d holds round-robin tile rows [d::n_model])."""
        trailing = bands.shape[1:]
        x = bands.reshape((n_model, band_rows, TILE_Y) + trailing)
        x = jnp.swapaxes(x, 0, 1).reshape(
            (n_model * band_rows * TILE_Y,) + trailing)
        return x[:height, :width]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("model"), P("model"),
                  P("model"), P("data"), P("data"), P("data"),
                  P("data", "model"), P()),
        out_specs=(P("model"), P("model"), P(), P("model"), P(), P()),
        check_vma=False)
    def _step(p_shard, adam_shard, alive_shard, view, proj, campos,
              target_band, iteration):
        row0 = jax.lax.axis_index("model")      # round-robin: rows d + k*n
        view = view[0]
        proj = proj[0]
        campos = campos[0]
        target_band = target_band[0]                      # (band_h, W, 3)
        alive = jax.lax.all_gather(alive_shard, "model", axis=0, tiled=True)

        def loss_fn(ps):
            from gstpu.models.gaussians import activate_params
            p = activate_params(_gather_params(ps), config.parameterization)
            image_band, _, aux = render(
                bset, tan_fovx, tan_fovy, config.scale_modifier,
                p["positions"], p["scales"], p["rotations"], p["opacities"],
                p["shs"], view, proj, campos, bg, alive, row0)
            # mask rows beyond the true image height (tile-grid padding);
            # band pixel row r lives in global tile row row0 + (r//16)*stride
            r = jnp.arange(image_band.shape[0])
            rows = (row0 + (r // TILE_Y) * n_model) * TILE_Y + r % TILE_Y
            mask = (rows < height)[:, None, None]
            # LOCAL partial sum only — collectives are applied to the grads
            # outside the differentiation (differentiating through psum under
            # manual sharding scales cotangents by the axis size).
            l1_partial = jnp.sum(jnp.abs(image_band - target_band) * mask)
            partial = (1.0 - lambda_dssim) * l1_partial \
                / (n_data * height * width * 3.0)
            if lambda_dssim > 0.0:
                # DSSIM needs the full image (11x11 windows cross band rows):
                # differentiable all_gather over 'model' — its vjp
                # psum_scatters each device's full-image cotangent back to the
                # band owners, so every device computing the same SSIM
                # contributes 1/n_model of the gradient (hence the /n_model).
                from gstpu.ops.losses import ssim
                full_img = _assemble_rows(jax.lax.all_gather(
                    image_band, "model", axis=0, tiled=True))
                full_tgt = _assemble_rows(jax.lax.all_gather(
                    target_band, "model", axis=0, tiled=True))
                partial = partial + lambda_dssim \
                    * (1.0 - ssim(full_img, full_tgt)) / (n_data * n_model)
            return partial, aux

        (partial, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p_shard)
        loss = jax.lax.psum(partial, ("data", "model"))
        # all_gather's vjp already reduce-scattered band contributions over
        # 'model'; sum the camera batch over 'data':
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, "data"), grads)
        lrs = schedule_lrs(config, iteration)
        new_p, new_adam = adam_step(p_shard, grads, adam_shard, lrs,
                                    iteration, config, alive=alive_shard)
        counts = jnp.stack([aux.num_pairs, aux.num_kept])
        counts = jax.lax.pmax(jax.lax.pmax(counts, "model"), "data")
        return new_p, new_adam, loss, grads["positions"], counts, \
            iteration + 1

    return _step


def pad_targets_to_grid(targets: jnp.ndarray, settings: RenderSettings,
                        n_model: int = 1):
    """(B, H, W, 3) -> (B, n_model*band_rows*16, W, 3), zero-padded and
    PERMUTED so a contiguous P("data", "model") split hands device d exactly
    its round-robin tile rows [d::n_model]."""
    band_rows = band_settings(settings, n_model).band_rows
    rows = band_rows * n_model
    h_pad = rows * TILE_Y - targets.shape[1]
    if h_pad:
        targets = jnp.pad(targets, ((0, 0), (0, h_pad), (0, 0), (0, 0)))
    if n_model == 1:
        return targets
    b = targets.shape[0]
    trailing = targets.shape[2:]
    t = targets.reshape((b, band_rows, n_model, TILE_Y) + trailing)
    t = jnp.swapaxes(t, 1, 2)
    return t.reshape((b, rows * TILE_Y) + trailing)

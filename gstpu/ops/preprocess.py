"""Vectorized preprocess stage: cull, project, EWA splat, SH color.

TPU equivalent of the reference's per-Gaussian ``wp_preprocess`` kernel
(forward.py:189-382).  The whole stage is one fused elementwise program over N
Gaussians; the reference's per-thread early-returns become masks:

- near cull ``p_view.z < 0.2`` (forward.py:250),
- degenerate 2D covariance ``det == 0`` (forward.py:278),
- empty tile rect (forward.py:301).

Write-ordering parity (which buffers a culled Gaussian still populates) is
preserved: ``cov3d`` is written for every Gaussian passing the near cull
(forward.py:260 precedes the det/rect checks), everything else only for fully
visible ones.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gstpu.ops import math3d


class PreprocessOut(NamedTuple):
    radii: jnp.ndarray          # (N,) int32, 0 if culled
    xy: jnp.ndarray             # (N, 2) f32 pixel-space means
    depth: jnp.ndarray          # (N,) f32 view-space z
    cov3d: jnp.ndarray          # (N, 6) packed 3D covariance
    rgb: jnp.ndarray            # (N, 3) SH-evaluated color
    conic: jnp.ndarray          # (N, 3) inverse 2D covariance (a, b, c)
    opacity: jnp.ndarray        # (N,) raw opacity
    tiles_touched: jnp.ndarray  # (N,) int32
    rect: jnp.ndarray           # (N, 4) int32 (min_x, min_y, max_x, max_y)
    clamped: jnp.ndarray        # (N, 3) f32 1.0 where SH color clamped at 0
    visible: jnp.ndarray        # (N,) bool — passed every cull


def preprocess(means: jnp.ndarray, scales: jnp.ndarray, rotations: jnp.ndarray,
               opacities: jnp.ndarray, shs: jnp.ndarray,
               view: jnp.ndarray, proj: jnp.ndarray, campos: jnp.ndarray,
               width: int, height: int, tan_fovx: float, tan_fovy: float,
               grid_x: int, grid_y: int, sh_degree: int,
               scale_modifier: float = 1.0, clamp_color: bool = True,
               alive: jnp.ndarray | None = None,
               tight_radius: bool = False) -> PreprocessOut:
    """Run the full preprocess over N Gaussians.

    ``alive`` optionally masks out dead (capacity-padding) Gaussians; dead ones
    behave exactly like culled ones (radii 0, tiles 0).

    ``tight_radius`` shrinks the tile rect to the Gaussian's exact
    alpha >= 1/255 reach: alpha(d) = op*exp(-0.5 q(d)) with
    q(d) >= lambda_min(conic) * d^2 = d^2 / lambda1, so every pixel farther
    than r_cut = sqrt(2*ln(255*op) * lambda1) is skipped by the rasterizer's
    alpha test anyway (forward.py:481) — dropping those tiles leaves the
    image and every gradient unchanged to f32 reassociation (their pairs
    contribute exact zeros; removal shifts chunk boundaries).  The reference's 3*sqrt(lambda1) rect (forward.py:293) equals
    r_cut only at op = 1.17; at op = 0.5 r_cut is 3.11*sigma and after an
    opacity reset to 0.01 it is 1.37*sigma — large pair-count savings.
    Changes radii/tiles_touched/n_contrib bookkeeping values, so strict
    parity tests keep it off.
    """
    n = means.shape[0]
    p_hom_in = jnp.concatenate([means, jnp.ones((n, 1), means.dtype)], axis=-1)

    # --- near cull (forward.py:248-251) ---
    # precision=HIGHEST: TPU matmuls default to bf16 MXU passes; that is
    # ~1px of projection jitter at 800x800, enough to stall SSIM training
    # (measured round 2: loss plateaus at 0.46 vs 0.13 with f32 matmuls).
    p_view = jnp.matmul(p_hom_in, view, precision=jax.lax.Precision.HIGHEST)
    depth = p_view[:, 2]
    near_ok = depth >= 0.2
    if alive is not None:
        near_ok = near_ok & alive

    # --- projection to NDC then pixels (forward.py:253-256, 295) ---
    p_hom = jnp.matmul(p_hom_in, proj, precision=jax.lax.Precision.HIGHEST)
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]
    px = math3d.ndc2pix(p_proj[:, 0], float(width))
    py = math3d.ndc2pix(p_proj[:, 1], float(height))

    # --- covariances (forward.py:258-273) ---
    cov3d = math3d.compute_cov3d(scales, scale_modifier, rotations)
    cov2d = math3d.compute_cov2d(means, cov3d, view, tan_fovx, tan_fovy,
                                 float(width), float(height))
    # unconditional low-pass blur h_var=0.3 (forward.py:265-273; the
    # antialiasing/prefiltered flags are dead in the reference — Q3).
    a = cov2d[:, 0] + 0.3
    b = cov2d[:, 1]
    c = cov2d[:, 2] + 0.3
    det = a * c - b * b
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    det_inv = 1.0 / det_safe
    conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=-1)

    # --- screen-space radius via eigenvalues (forward.py:287-293) ---
    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda2 = mid - jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, lambda2)))
    if tight_radius:
        lam = jnp.maximum(lambda1, lambda2)
        r_cut2 = 2.0 * jnp.log(jnp.maximum(255.0 * opacities, 1e-12)) * lam
        radius_f = jnp.minimum(radius_f,
                               jnp.ceil(jnp.sqrt(jnp.maximum(r_cut2, 0.0))))

    # --- tile rect (forward.py:297-301) ---
    rmin_x, rmin_y, rmax_x, rmax_y = math3d.get_rect(px, py, radius_f,
                                                     grid_x, grid_y)
    tiles = (rmax_y - rmin_y) * (rmax_x - rmin_x)
    rect_ok = tiles != 0

    visible = near_ok & det_ok & rect_ok

    # --- SH color (forward.py:303-346) ---
    dirs_raw = means - campos[None, :]
    norm = jnp.linalg.norm(dirs_raw, axis=-1, keepdims=True)
    dirs = dirs_raw / jnp.maximum(norm, 1e-12)
    rgb = math3d.eval_sh(shs, dirs, sh_degree) + 0.5
    clamped = (rgb < 0.0).astype(rgb.dtype)
    if clamp_color:
        rgb = jnp.maximum(rgb, 0.0)

    # --- masked writes, matching the reference's early-return buffer states ---
    vis_f = visible.astype(means.dtype)
    zero_i = jnp.zeros((), jnp.int32)
    out = PreprocessOut(
        radii=jnp.where(visible, radius_f.astype(jnp.int32), zero_i),
        xy=jnp.stack([px, py], axis=-1) * vis_f[:, None],
        depth=depth * vis_f,
        cov3d=cov3d * near_ok.astype(means.dtype)[:, None],
        rgb=rgb * vis_f[:, None],
        conic=conic * vis_f[:, None],
        opacity=opacities * vis_f,
        tiles_touched=jnp.where(visible, tiles, zero_i),
        rect=jnp.where(visible[:, None],
                       jnp.stack([rmin_x, rmin_y, rmax_x, rmax_y], axis=-1),
                       zero_i),
        clamped=clamped * vis_f[:, None],
        visible=visible,
    )
    return out

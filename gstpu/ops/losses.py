"""Image losses: L1, SSIM (with gradient), depth loss, PSNR.

Reference surface: loss.py.  Parity notes:
- L1 normalizes by H*W*3 (loss.py:174) — identical to ``jnp.mean(|diff|)``;
- the pixel gradient is ``sign(r - t) * (1 - λ) / (H*W*3)`` (loss.py:121-146);
- the reference defines SSIM but never uses it (λ_dssim = 0, train.py:967-974)
  and never implemented its gradient (loss.py:243 TODO).  We implement the
  official-3DGS 11x11 σ=1.5 separable-window SSIM *differentiably*, closing
  that gap for the standard training recipe;
- depth loss (loss.py:247-303) defined-but-unused in the reference; provided.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SSIM_C1 = 0.01 ** 2
SSIM_C2 = 0.03 ** 2
SSIM_WINDOW = 11
SSIM_SIGMA = 1.5


def l1_loss(rendered: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error over all pixels and channels (loss.py:148-176)."""
    return jnp.mean(jnp.abs(rendered - target))


def l1_pixel_gradients(rendered: jnp.ndarray, target: jnp.ndarray,
                       lambda_dssim: float = 0.0) -> jnp.ndarray:
    """dL/dpixel of the (1-λ)·L1 term (loss.py:121-146, 217-244)."""
    h, w = rendered.shape[0], rendered.shape[1]
    weight = (1.0 - lambda_dssim) / (h * w * 3.0)
    return weight * jnp.sign(rendered - target)


def _gaussian_window(size: int = SSIM_WINDOW, sigma: float = SSIM_SIGMA):
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return g / jnp.sum(g)


def _filter2d_separable(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable 2D filter on (H, W, C), 'same' (zero) padding.

    Implemented as two depthwise ``lax.conv_general_dilated`` calls.  (An
    unrolled shifted-slice formulation compiled INCORRECTLY on the TPU
    backend — jit output diverged from eager by 0.64 on a constant input —
    so the canonical conv path is used.)
    """
    k = window.shape[0]
    c = img.shape[-1]
    x = img[None]                                     # (1, H, W, C)
    dn = jax.lax.conv_dimension_numbers(x.shape, (k, 1, 1, c),
                                        ("NHWC", "HWIO", "NHWC"))
    kv = jnp.tile(window.reshape(k, 1, 1, 1), (1, 1, 1, c))
    y = jax.lax.conv_general_dilated(x, kv, (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    kh = jnp.tile(window.reshape(1, k, 1, 1), (1, 1, 1, c))
    dn2 = jax.lax.conv_dimension_numbers(y.shape, (1, k, 1, c),
                                         ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(y, kh, (1, 1), "SAME",
                                     dimension_numbers=dn2,
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    return y[0]


def _filter_chunks(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable filter over HALO-EXTENDED row chunks (B, He, W, C):
    VALID vertically (He -> He - (k-1)), SAME (zero) horizontally.

    Equals the full-image SAME filter of :func:`_filter2d_separable` wherever
    the (k-1)/2-row halos carry the true neighboring image rows (and zeros at
    the global image borders) — the basis of the band-local sharded SSIM
    (gstpu/parallel/sharded.py), which exchanges 5-row halos over the model
    axis instead of all_gathering the full image."""
    k = window.shape[0]
    c = x.shape[-1]
    dn = jax.lax.conv_dimension_numbers(x.shape, (k, 1, 1, c),
                                        ("NHWC", "HWIO", "NHWC"))
    kv = jnp.tile(window.reshape(k, 1, 1, 1), (1, 1, 1, c))
    y = jax.lax.conv_general_dilated(x, kv, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    kh = jnp.tile(window.reshape(1, k, 1, 1), (1, 1, 1, c))
    dn2 = jax.lax.conv_dimension_numbers(y.shape, (1, k, 1, c),
                                         ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(y, kh, (1, 1), "SAME",
                                        dimension_numbers=dn2,
                                        feature_group_count=c,
                                        precision=jax.lax.Precision.HIGHEST)


def ssim_map_chunks(img_ext: jnp.ndarray, tgt_ext: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel SSIM over halo-extended chunks.

    ``img_ext``/``tgt_ext``: (B, rows + 2*5, W, 3) — each chunk carries 5
    halo rows above and below (true neighbor rows, or zeros at the global
    image border).  Returns the (B, rows, W, 3) SSIM map, bit-matching the
    corresponding rows of the full-image :func:`ssim` formula."""
    win = _gaussian_window()
    stack = jnp.concatenate([img_ext, tgt_ext, img_ext * img_ext,
                             tgt_ext * tgt_ext, img_ext * tgt_ext], axis=-1)
    f = _filter_chunks(stack, win)
    mu1, mu2, x2, y2, xy = jnp.split(f, 5, axis=-1)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1 = x2 - mu1_sq
    sigma2 = y2 - mu2_sq
    sigma12 = xy - mu12
    num = (2.0 * mu12 + SSIM_C1) * (2.0 * sigma12 + SSIM_C2)
    den = (mu1_sq + mu2_sq + SSIM_C1) * (sigma1 + sigma2 + SSIM_C2)
    return num / den


@functools.partial(jax.jit, static_argnames=("clamp_sigma",))
def ssim(rendered: jnp.ndarray, target: jnp.ndarray,
         clamp_sigma: bool = False) -> jnp.ndarray:
    """Differentiable SSIM, official-3DGS style (11x11 Gaussian window).

    Uniform-padded convolutions; mean over pixels and channels.  This is the
    standard recipe the reference's unused ssim_kernel approximates
    (loss.py:33-119).

    ``clamp_sigma`` floors the variance estimates at 0 — zero-padded borders
    can produce negative estimates whose near-zero denominator blows the
    ratio past 1.  Off by default (exact official formula, used by the loss);
    evaluation metrics enable it.
    """
    win = _gaussian_window()
    mu1 = _filter2d_separable(rendered, win)
    mu2 = _filter2d_separable(target, win)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1 = _filter2d_separable(rendered * rendered, win) - mu1_sq
    sigma2 = _filter2d_separable(target * target, win) - mu2_sq
    sigma12 = _filter2d_separable(rendered * target, win) - mu12
    if clamp_sigma:
        sigma1 = jnp.maximum(sigma1, 0.0)
        sigma2 = jnp.maximum(sigma2, 0.0)
    num = (2.0 * mu12 + SSIM_C1) * (2.0 * sigma12 + SSIM_C2)
    den = (mu1_sq + mu2_sq + SSIM_C1) * (sigma1 + sigma2 + SSIM_C2)
    return jnp.mean(num / den)


def combined_loss(rendered: jnp.ndarray, target: jnp.ndarray,
                  lambda_dssim: float = 0.0) -> jnp.ndarray:
    """(1-λ)·L1 + λ·(1-SSIM) — the official 3DGS objective (train.py:967-974,
    commented out in the reference; active when λ > 0)."""
    l1 = l1_loss(rendered, target)
    if lambda_dssim == 0.0:
        return l1
    return (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim(rendered, target))


def depth_loss(rendered_inv_depth: jnp.ndarray, target_inv_depth: jnp.ndarray,
               mask: jnp.ndarray) -> jnp.ndarray:
    """Masked L1 on inverse depth (loss.py:247-303); mean over all pixels."""
    diff = jnp.abs(rendered_inv_depth - target_inv_depth) * mask
    return jnp.sum(diff) / (rendered_inv_depth.shape[0] * rendered_inv_depth.shape[1])


def psnr(rendered: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """PSNR in dB for [0,1] images (new: the reference never evaluates it)."""
    mse = jnp.mean((rendered - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))

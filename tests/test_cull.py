"""Exactness of per-tile pair culling + two-tier capacity slicing.

The cull (RenderSettings.pair_cull) drops (tile, Gaussian) pairs whose max
alpha over the tile is provably < 1/255 — pairs the rasterizer's alpha test
(reference forward.py:481) skips at every pixel — so the image and ALL
gradients must match the un-culled render to f32 reassociation (pair removal
shifts chunk boundaries, like tight_radius).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstpu.config import RenderSettings
from gstpu.ops.rasterize import render
from tests import scenes


def _scene(n=600, seed=3):
    rng = np.random.default_rng(seed)
    cam = scenes.example_camera(width=128, height=128)
    pts, shs, scales, rotations, opacities = scenes.random_scene(
        rng, n=n, extent=1.3, z_center=-10.0,
        opacity_range=(0.01, 0.9), scale_range=(0.01, 0.08))
    j = jnp.asarray
    args = (j(pts), j(scales), j(rotations), j(opacities), j(shs))
    cam_args = (j(cam["view"]), j(cam["proj"]), j(cam["campos"]),
                jnp.zeros(3, jnp.float32))
    return cam, args, cam_args


def _fwd_bwd(settings, cam, cam_args):
    @jax.jit
    def f(*a):
        def loss(*aa):
            img, depth, aux = render(
                settings, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                *aa, *cam_args, None, jnp.int32(0))
            mod = jnp.cos(jnp.arange(img.size).reshape(img.shape))
            return jnp.sum(img * mod) + 0.3 * jnp.sum(depth), aux
        (l, aux), g = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True)(*a)
        return l, g, aux
    return f


@pytest.mark.parametrize("use_pallas", [False, True])
def test_cull_is_exact(use_pallas):
    cam, args, cam_args = _scene()
    s0 = RenderSettings(width=128, height=128, pair_capacity=1 << 13,
                        tight_radius=True, use_pallas=use_pallas,
                        pallas_interpret=use_pallas)
    s1 = dataclasses.replace(s0, pair_cull=True, kept_capacity=1 << 12)
    l0, g0, aux0 = _fwd_bwd(s0, cam, cam_args)(*args)
    l1, g1, aux1 = _fwd_bwd(s1, cam, cam_args)(*args)
    kept, total = int(aux1.num_kept), int(aux1.num_pairs)
    assert total == int(aux0.num_pairs)
    assert kept < total, "cull removed nothing on a scene where it should"
    assert kept <= 1 << 12, "fixture must not overflow kept_capacity"
    np.testing.assert_allclose(float(l0), float(l1), atol=1e-5)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_cull_exact_in_strided_band():
    """Row-stride band mode maps band-local tile rows back to global pixel
    rows inside the cull distance test — a wrong mapping would cull pairs
    that DO contribute to the band."""
    cam, args, cam_args = _scene()
    stride = 4
    rows = -(-(128 // 16) // stride)
    s0 = RenderSettings(width=128, height=128, pair_capacity=1 << 13,
                        tight_radius=True, tile_rows=rows, row_stride=stride)
    s1 = dataclasses.replace(s0, pair_cull=True)
    import functools
    for row0 in (0, stride - 1):
        @functools.partial(jax.jit, static_argnums=0)
        def band(st, *a):
            img, depth, _ = render(st, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                                   *a, *cam_args, None, jnp.int32(row0))
            return img, depth
        img0, dep0 = band(s0, *args)
        img1, dep1 = band(s1, *args)
        np.testing.assert_allclose(np.asarray(img0), np.asarray(img1),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(dep0), np.asarray(dep1),
                                   atol=2e-5)


def test_kept_overflow_is_reported():
    """num_kept reports the TRUE post-cull requirement even when it exceeds
    kept_capacity (the trainer's regrow signal)."""
    cam, args, cam_args = _scene()
    s_ref = RenderSettings(width=128, height=128, pair_capacity=1 << 13,
                           tight_radius=True, pair_cull=True)
    _, _, aux_ref = _fwd_bwd(s_ref, cam, cam_args)(*args)
    true_kept = int(aux_ref.num_kept)
    tiny = 256
    assert true_kept > tiny
    s_tiny = dataclasses.replace(s_ref, kept_capacity=tiny)
    _, _, aux = _fwd_bwd(s_tiny, cam, cam_args)(*args)
    assert int(aux.num_kept) == true_kept

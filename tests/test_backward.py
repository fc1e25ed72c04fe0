"""Backward gradient parity vs the NumPy oracle of reference backward.py,
plus finite-difference consistency of the non-parity (self-consistent) mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import scenes
from tests.oracle import ref_numpy

from gstpu.config import RenderSettings
from gstpu.ops.rasterize import render

BG = np.zeros(3, np.float32)


def _jax_grads(pts, shs, scales, rotations, opacities, cam, ct_image,
               bg=BG, parity=True):
    # strict-parity tests replicate Q15's translation bias when parity=True
    settings = RenderSettings(width=cam["width"], height=cam["height"],
                              pair_capacity=1 << 14, parity=parity,
                              grad_bias_parity=parity)
    j = jnp.asarray

    def f(means, scales_, rots, opac, shs_):
        img, _, _ = render(settings, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                           means, scales_, rots, opac, shs_,
                           j(cam["view"]), j(cam["proj"]), j(cam["campos"]),
                           j(bg), None, jnp.int32(0))
        return img

    _, vjp = jax.vjp(f, j(pts), j(scales), j(rotations), j(opacities), j(shs))
    dmean, dscale, drot, dopac, dsh = vjp(j(ct_image))
    return {k: np.asarray(v) for k, v in
            dict(dL_dmean3D=dmean, dL_dscale=dscale, dL_drot=drot,
                 dL_dopacity=dopac, dL_dshs=dsh).items()}


def _assert_close(a, b, name, atol=2e-6, rtol=1e-4):
    scale = max(np.max(np.abs(b)), 1e-8)
    np.testing.assert_allclose(a / scale, b / scale, atol=atol, rtol=rtol,
                               err_msg=name)


@pytest.mark.parametrize("seed,n,opac", [(0, 60, (0.2, 0.8)),
                                         (1, 30, (0.5, 0.9)),
                                         (2, 100, (0.05, 0.4))])
def test_gradients_match_oracle(seed, n, opac):
    rng = np.random.default_rng(seed)
    cam = scenes.example_camera(width=64, height=64)
    pts, shs, scales, rotations, opacities = scenes.random_scene(
        rng, n=n, opacity_range=opac)
    ct = rng.normal(0, 1.0, (64, 64, 3)).astype(np.float32)

    got = _jax_grads(pts, shs, scales, rotations, opacities, cam, ct)
    want = ref_numpy.backward(pts, scales, rotations, opacities, shs,
                              cam["view"], cam["proj"], cam["campos"],
                              64, 64, cam["tan_fovx"], cam["tan_fovy"],
                              degree=3, bg=BG, dL_dpix=ct)
    for k in ["dL_dmean3D", "dL_dscale", "dL_drot", "dL_dopacity", "dL_dshs"]:
        _assert_close(got[k], want[k], k, atol=5e-5)


def test_gradients_match_oracle_three_gaussians():
    cam = scenes.example_camera(width=64, height=64)
    pts, shs, scales, rotations, opacities = scenes.three_gaussian_scene()
    rng = np.random.default_rng(7)
    ct = rng.normal(0, 1.0, (64, 64, 3)).astype(np.float32)
    got = _jax_grads(pts, shs, scales, rotations, opacities, cam, ct)
    want = ref_numpy.backward(pts, scales, rotations, opacities, shs,
                              cam["view"], cam["proj"], cam["campos"],
                              64, 64, cam["tan_fovx"], cam["tan_fovy"],
                              degree=3, bg=BG, dL_dpix=ct)
    for k in ["dL_dmean3D", "dL_dscale", "dL_drot", "dL_dopacity", "dL_dshs"]:
        _assert_close(got[k], want[k], k, atol=5e-5)


def test_white_background_gradients_match_oracle():
    rng = np.random.default_rng(3)
    cam = scenes.example_camera(width=64, height=64)
    pts, shs, scales, rotations, opacities = scenes.random_scene(rng, n=40)
    bg = np.ones(3, np.float32)
    ct = rng.normal(0, 1.0, (64, 64, 3)).astype(np.float32)
    got = _jax_grads(pts, shs, scales, rotations, opacities, cam, ct, bg=bg)
    want = ref_numpy.backward(pts, scales, rotations, opacities, shs,
                              cam["view"], cam["proj"], cam["campos"],
                              64, 64, cam["tan_fovx"], cam["tan_fovy"],
                              degree=3, bg=bg, dL_dpix=ct)
    for k in ["dL_dmean3D", "dL_dscale", "dL_drot", "dL_dopacity", "dL_dshs"]:
        _assert_close(got[k], want[k], k, atol=5e-5)


def test_composite_backward_matches_autodiff():
    """The hand-written compositing adjoint equals JAX autodiff through the
    parallel compositing formulation (with masks held constant, exactly as the
    reference treats its branch skips)."""
    from gstpu.ops.binning import build_pairs
    from gstpu.ops.preprocess import preprocess
    from gstpu.ops.rasterize import (composite_backward, composite_forward,
                                     image_to_tiles)

    rng = np.random.default_rng(11)
    cam = scenes.example_camera(width=32, height=32)
    # opacities < 0.9 keep alpha off the (non-differentiated) 0.99 clamp
    pts, shs, scales, rotations, opacities = scenes.random_scene(
        rng, n=25, opacity_range=(0.2, 0.8))
    settings = RenderSettings(width=32, height=32, pair_capacity=1 << 13)
    j = jnp.asarray
    prep = preprocess(j(pts), j(scales), j(rotations), j(opacities), j(shs),
                      j(cam["view"]), j(cam["proj"]), j(cam["campos"]),
                      32, 32, cam["tan_fovx"], cam["tan_fovy"],
                      settings.grid_x, settings.grid_y, 3)
    pairs = build_pairs(prep.tiles_touched, prep.rect, prep.depth,
                        settings.grid_x, settings.num_tiles,
                        settings.pair_capacity)
    bg = jnp.asarray([0.3, 0.1, 0.5], jnp.float32)
    ct_img = rng.normal(0, 1.0, (32, 32, 3)).astype(np.float32)
    ct_tiles = image_to_tiles(j(ct_img), settings)

    chunks = int(np.ceil(int(jnp.max(pairs.tile_count)) / settings.chunk))

    def fwd(xy, conic, opacity, rgb):
        p = prep._replace(xy=xy, conic=conic, opacity=opacity, rgb=rgb)
        color, _, trans, _ = composite_forward(p, pairs, settings,
                                               static_chunks=chunks)
        return jnp.sum((color + trans[:, :, None] * bg[None, None, :]) * ct_tiles)

    auto = jax.grad(fwd, argnums=(0, 1, 2, 3))(
        prep.xy, prep.conic, prep.opacity, prep.rgb)

    color, _, final_t, _ = composite_forward(prep, pairs, settings)
    d_color, d_mean2d_ndc, d_conic, d_opac, _d_invd = composite_backward(
        prep, pairs, settings, color, final_t, ct_tiles, bg)
    # hand-written mean2d grads are NDC-scaled (reference backward.py:631-632)
    d_xy = np.asarray(d_mean2d_ndc) / np.array([0.5 * 32, 0.5 * 32])

    # the hand-written conic-b gradient uses the reference's HALF-b convention
    # (backward.py:698-703); double it to compare with the true gradient.
    d_conic_true = np.asarray(d_conic) * np.array([1.0, 2.0, 1.0])

    _assert_close(d_xy, np.asarray(auto[0]), "d_xy", atol=1e-5)
    _assert_close(d_conic_true, np.asarray(auto[1]), "d_conic", atol=1e-5)
    _assert_close(np.asarray(d_opac), np.asarray(auto[2]), "d_opac", atol=1e-5)
    _assert_close(np.asarray(d_color), np.asarray(auto[3]), "d_color", atol=1e-5)


def test_consistent_cov3d_backward_matches_autodiff():
    from gstpu.ops.math3d import compute_cov3d
    from gstpu.ops.preprocess_bwd import cov3d_backward

    rng = np.random.default_rng(12)
    n = 40
    scales = rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)
    q = rng.normal(0, 1, (n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ct = rng.normal(0, 1, (n, 6)).astype(np.float32)
    radii = np.ones(n, np.int32)

    def f(s, r):
        return jnp.sum(compute_cov3d(s, 1.0, r) * jnp.asarray(ct))

    ds_auto, dr_auto = jax.grad(f, argnums=(0, 1))(jnp.asarray(scales),
                                                   jnp.asarray(q))
    ds, dr = cov3d_backward(jnp.asarray(scales), jnp.asarray(q),
                            jnp.asarray(radii), 1.0, jnp.asarray(ct),
                            parity=False)
    _assert_close(np.asarray(ds), np.asarray(ds_auto), "dscale", atol=1e-5)
    _assert_close(np.asarray(dr), np.asarray(dr_auto), "drot", atol=1e-5)


def test_consistent_cov2d_backward_matches_autodiff():
    from gstpu.ops.math3d import compute_cov2d
    from gstpu.ops.preprocess_bwd import cov2d_backward

    rng = np.random.default_rng(13)
    cam = scenes.example_camera(width=64, height=64)
    n = 30
    pts, _, scales, rotations, _ = scenes.random_scene(rng, n=n, extent=1.5)
    from gstpu.ops.math3d import compute_cov3d
    cov3d = compute_cov3d(jnp.asarray(scales), 1.0, jnp.asarray(rotations))
    ct = rng.normal(0, 1, (n, 3)).astype(np.float32)
    radii = np.ones(n, np.int32)
    view = jnp.asarray(cam["view"])
    tfx, tfy = cam["tan_fovx"], cam["tan_fovy"]

    def f(means, c6):
        cov2d = compute_cov2d(means, c6, view, tfx, tfy, 64.0, 64.0)
        # blur + conic inversion as in preprocess
        a = cov2d[:, 0] + 0.3
        b = cov2d[:, 1]
        c = cov2d[:, 2] + 0.3
        det_inv = 1.0 / (a * c - b * b)
        conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], -1)
        return jnp.sum(conic * jnp.asarray(ct))

    dm_auto, dc6_auto = jax.grad(f, argnums=(0, 1))(jnp.asarray(pts), cov3d)
    # cov2d_backward expects the reference's half-b input convention
    ct_half_b = ct * np.array([1.0, 0.5, 1.0], np.float32)
    dm, dc6 = cov2d_backward(jnp.asarray(pts), cov3d, jnp.asarray(radii),
                             64.0 / (2 * tfx), 64.0 / (2 * tfy), tfx, tfy,
                             view, jnp.asarray(ct_half_b), parity=False)
    _assert_close(np.asarray(dc6), np.asarray(dc6_auto), "dcov3d", atol=1e-4)
    _assert_close(np.asarray(dm), np.asarray(dm_auto), "dmean", atol=1e-4)


def test_finite_differences_on_smooth_params():
    """FD check restricted to SH directions — the only truly smooth
    parameters.  (Opacity moves the α<1/255 cutoff contour, making the loss
    genuinely discontinuous; its gradient is verified exactly against autodiff
    in test_composite_backward_matches_autodiff instead.)"""
    rng = np.random.default_rng(5)
    cam = scenes.example_camera(width=32, height=32)
    pts, shs, scales, rotations, opacities = scenes.random_scene(
        rng, n=20, opacity_range=(0.3, 0.6), scale_range=(0.3, 0.7))
    ct = rng.normal(0, 1.0, (32, 32, 3)).astype(np.float32)
    grads = _jax_grads(pts, shs, scales, rotations, opacities, cam, ct,
                       parity=False)
    settings = RenderSettings(width=32, height=32, pair_capacity=1 << 13,
                              parity=False)
    j = jnp.asarray

    def loss(opac, shs_):
        img, _, _ = render(settings, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                           j(pts), j(scales), j(rotations), j(opac), j(shs_),
                           j(cam["view"]), j(cam["proj"]), j(cam["campos"]),
                           j(BG), None, jnp.int32(0))
        return float(jnp.sum(img * j(ct)))

    eps = 1e-2  # large enough that FD signal dominates f32 loss rounding
    for ai, name in [(1, "dL_dshs")]:
        args = [opacities, shs]
        d = rng.normal(0, 1, args[ai].shape).astype(np.float32)
        d /= np.linalg.norm(d)
        plus = [a.copy() for a in args]
        minus = [a.copy() for a in args]
        plus[ai] = plus[ai] + eps * d
        minus[ai] = minus[ai] - eps * d
        fd = (loss(*plus) - loss(*minus)) / (2 * eps)
        analytic = float(np.sum(grads[name] * d))
        assert abs(fd - analytic) <= 5e-2 * max(abs(fd), abs(analytic), 1.0), (
            name, fd, analytic)


def test_depth_gradients_finite_differences():
    """Depth is differentiable (beyond-parity: the reference's depth loss has
    no backward, loss.py:243).  Check d(sum depth)/d(position z) by central
    finite differences on smooth, well-separated Gaussians."""
    from gstpu.config import RenderSettings
    from gstpu.ops.rasterize import render

    rng = np.random.default_rng(9)
    cam = scenes.example_camera(width=48, height=48)
    pts, shs, scales, rotations, opacities = scenes.random_scene(
        rng, n=6, opacity_range=(0.4, 0.6), scale_range=(0.15, 0.25))
    settings = RenderSettings(width=48, height=48, pair_capacity=1 << 11)
    j = jnp.asarray
    w = jnp.asarray(rng.normal(size=(48, 48)).astype(np.float32))

    def loss(p):
        _, depth, _ = render(settings, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                             p, j(scales), j(rotations), j(opacities), j(shs),
                             j(cam["view"]), j(cam["proj"]), j(cam["campos"]),
                             jnp.zeros(3, jnp.float32), None, jnp.int32(0))
        return jnp.sum(depth * w)

    g = np.asarray(jax.grad(loss)(j(pts)))
    eps = 1e-3
    for i in (0, 3):
        for axis in range(3):
            dp = np.zeros_like(pts)
            dp[i, axis] = eps
            fd = (float(loss(j(pts + dp))) - float(loss(j(pts - dp)))) / (2 * eps)
            np.testing.assert_allclose(g[i, axis], fd, rtol=0.05, atol=1e-4)

"""Forward rendering parity vs the NumPy oracle of reference forward.py."""

import numpy as np
import pytest

from tests import scenes
from tests.oracle import ref_numpy

from gstpu.render import render_gaussians

BG = np.zeros(3, np.float32)


def _render_both(pts, shs, scales, rotations, opacities, cam, bg=BG):
    image, depth, aux = render_gaussians(
        background=bg, means3D=pts, opacity=opacities, scales=scales,
        rotations=rotations, viewmatrix=cam["view"], projmatrix=cam["proj"],
        tan_fovx=cam["tan_fovx"], tan_fovy=cam["tan_fovy"],
        image_height=cam["height"], image_width=cam["width"],
        sh=shs, degree=3, campos=cam["campos"])
    ref_img, ref_depth, ref_aux = ref_numpy.render(
        pts, scales, rotations, opacities, shs,
        cam["view"], cam["proj"], cam["campos"],
        cam["width"], cam["height"], cam["tan_fovx"], cam["tan_fovy"],
        degree=3, bg=bg)
    return (np.asarray(image), np.asarray(depth), aux), (ref_img, ref_depth, ref_aux)


def test_three_gaussian_scene_matches_oracle():
    cam = scenes.example_camera(width=128, height=128)
    pts, shs, scales, rotations, opacities = scenes.three_gaussian_scene()
    (img, depth, aux), (ref_img, ref_depth, ref_aux) = _render_both(
        pts, shs, scales, rotations, opacities, cam)
    np.testing.assert_allclose(img, ref_img, atol=2e-5)
    np.testing.assert_allclose(depth, ref_depth, atol=2e-5)
    # something was actually rendered
    assert img.max() > 0.05


def test_random_scene_matches_oracle():
    rng = np.random.default_rng(0)
    cam = scenes.example_camera(width=64, height=64)
    pts, shs, scales, rotations, opacities = scenes.random_scene(rng, n=80)
    (img, depth, aux), (ref_img, ref_depth, ref_aux) = _render_both(
        pts, shs, scales, rotations, opacities, cam)
    np.testing.assert_allclose(img, ref_img, atol=5e-5)
    np.testing.assert_allclose(depth, ref_depth, atol=5e-5)


def test_random_scene_white_background():
    rng = np.random.default_rng(1)
    cam = scenes.example_camera(width=64, height=64)
    pts, shs, scales, rotations, opacities = scenes.random_scene(rng, n=40)
    bg = np.ones(3, np.float32)
    (img, _, _), (ref_img, _, _) = _render_both(
        pts, shs, scales, rotations, opacities, cam, bg=bg)
    np.testing.assert_allclose(img, ref_img, atol=5e-5)


def test_final_t_and_ncontrib_match_oracle():
    rng = np.random.default_rng(2)
    cam = scenes.example_camera(width=64, height=64)
    pts, shs, scales, rotations, opacities = scenes.random_scene(
        rng, n=60, opacity_range=(0.7, 1.0))
    (_, _, aux), (_, _, ref_aux) = _render_both(
        pts, shs, scales, rotations, opacities, cam)
    from gstpu.config import RenderSettings
    from gstpu.ops.rasterize import tiles_to_image
    s = RenderSettings(width=64, height=64)
    final_t = np.asarray(tiles_to_image(aux.final_t, s))
    n_contrib = np.asarray(tiles_to_image(aux.n_contrib, s))
    # Pixels whose transmittance sits exactly at the 1e-4 early-stop threshold
    # can flip the keep decision under f32 reassociation; exempt those.
    at_threshold = (final_t < 6e-4) & (ref_aux["final_t"] < 6e-4)
    ok = np.abs(final_t - ref_aux["final_t"]) <= 1e-5
    assert np.all(ok | at_threshold)
    same_contrib = n_contrib == ref_aux["n_contrib"]
    assert np.all(same_contrib | at_threshold)


def test_preprocess_buffers_match_oracle():
    rng = np.random.default_rng(3)
    cam = scenes.example_camera(width=64, height=64)
    pts, shs, scales, rotations, opacities = scenes.random_scene(rng, n=50)
    # push some gaussians behind the camera / off-screen to exercise culls
    pts[:5, 2] = 20.0
    pts[5:8, 0] = 500.0
    (_, _, aux), (_, _, ref_aux) = _render_both(
        pts, shs, scales, rotations, opacities, cam)
    np.testing.assert_array_equal(np.asarray(aux.radii),
                                  ref_aux["prep"]["radii"])
    vis = ref_aux["prep"]["radii"] > 0
    np.testing.assert_allclose(np.asarray(aux.xy)[vis],
                               ref_aux["prep"]["xy"][vis], atol=1e-3)


def test_empty_scene_renders_background():
    cam = scenes.example_camera(width=32, height=32)
    pts = np.array([[0.0, 0.0, 100.0]], np.float32)  # behind the camera
    shs = np.zeros((1, 16, 3), np.float32)
    bg = np.array([0.2, 0.4, 0.6], np.float32)
    img, depth, aux = render_gaussians(
        background=bg, means3D=pts, opacity=np.ones(1, np.float32),
        scales=np.ones((1, 3), np.float32),
        rotations=np.array([[0, 0, 0, 1]], np.float32),
        viewmatrix=cam["view"], projmatrix=cam["proj"],
        tan_fovx=cam["tan_fovx"], tan_fovy=cam["tan_fovy"],
        image_height=32, image_width=32, sh=shs, degree=3,
        campos=cam["campos"])
    np.testing.assert_allclose(np.asarray(img),
                               np.broadcast_to(bg, (32, 32, 3)), atol=1e-6)
    assert int(aux.num_pairs) == 0


def test_matrix_to_quaternion_roundtrip():
    """quat -> matrix -> quat is identity up to sign (math_utils.py:43-85)."""
    import jax.numpy as jnp
    from gstpu.ops.math3d import matrix_to_quaternion, quat_to_rotmat

    rng = np.random.default_rng(11)
    q = rng.normal(size=(64, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(matrix_to_quaternion(R))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=2e-3)


def test_tight_radius_is_exact():
    """tight_radius shrinks tile rects to the alpha >= 1/255 reach: images
    and gradients are unchanged to f32 reassociation (removed pairs
    contribute exact zeros; their removal shifts chunk boundaries), and
    pair counts drop."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gstpu.config import RenderSettings
    from gstpu.ops.rasterize import render

    rng = np.random.default_rng(5)
    cam = scenes.example_camera(width=64, height=64)
    pts, shs, scales, rotations, opacities = scenes.random_scene(
        rng, n=60, opacity_range=(0.01, 0.6))  # low opacity: big savings
    j = jnp.asarray
    base = RenderSettings(width=64, height=64, pair_capacity=1 << 13)
    tight = dataclasses.replace(base, tight_radius=True)
    ct = j(rng.normal(0, 1, (64, 64, 3)).astype(np.float32))

    outs = {}
    for name, s in (("base", base), ("tight", tight)):
        def f(*params, s=s):
            img, _, aux = render(s, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                                 *params, j(cam["view"]), j(cam["proj"]),
                                 j(cam["campos"]), jnp.zeros(3, jnp.float32),
                                 None, jnp.int32(0))
            return jnp.sum(img * ct), (img, aux)
        (_, (img, aux)), grads = jax.value_and_grad(
            f, argnums=(0, 1, 2, 3, 4), has_aux=True)(
            j(pts), j(scales), j(rotations), j(opacities), j(shs))
        outs[name] = (np.asarray(img), [np.asarray(g) for g in grads],
                      int(aux.num_pairs))

    img_b, grads_b, pairs_b = outs["base"]
    img_t, grads_t, pairs_t = outs["tight"]
    assert pairs_t < pairs_b, (pairs_t, pairs_b)  # pairs actually culled
    # removed pairs contribute exact zeros, but their removal shifts chunk
    # boundaries, reassociating the f32 carries -> 1-ulp level differences
    np.testing.assert_allclose(img_t, img_b, atol=1e-6)
    for gb, gt in zip(grads_b, grads_t):
        scale = max(np.max(np.abs(gb)), 1e-8)
        np.testing.assert_allclose(gt / scale, gb / scale, atol=1e-6)


def test_traced_tan_fov_matches_static():
    """Per-view intrinsics: tan_fov passed as TRACED scalars (one compiled
    step for a multi-camera rig) renders and differentiates identically to
    the Python-float (trace-constant) path."""
    import jax
    import jax.numpy as jnp

    from gstpu.config import RenderSettings
    from gstpu.ops.rasterize import render

    rng = np.random.default_rng(11)
    cam = scenes.example_camera(width=64, height=64)
    pts, shs, scales, rotations, opacities = scenes.random_scene(
        rng, n=40, extent=1.3, z_center=-8.0)
    s = RenderSettings(width=64, height=64, pair_capacity=1 << 12)
    j = jnp.asarray
    rest = (j(cam["view"]), j(cam["proj"]), j(cam["campos"]),
            jnp.zeros(3, jnp.float32), None, jnp.int32(0))
    args = (j(pts), j(scales), j(rotations), j(opacities), j(shs))

    def loss_static(*p):
        img, _, _ = render(s, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                           *p, *rest)
        return jnp.sum(img * img), img

    @jax.jit
    def loss_traced(tx, ty, *p):
        img, _, _ = render(s, tx, ty, 1.0, *p, *rest)
        return jnp.sum(img * img), img

    (ls, img_s), gs = jax.value_and_grad(loss_static, argnums=(0, 1, 2),
                                         has_aux=True)(*args)
    (lt, img_t), gt = jax.value_and_grad(loss_traced, argnums=(2, 3, 4),
                                         has_aux=True)(
        jnp.float32(cam["tan_fovx"]), jnp.float32(cam["tan_fovy"]), *args)
    # static Python-float tan is constant-folded in double (1.3*tan rounds
    # once); the traced path rounds tan to f32 first -> ulp-level slack
    assert float(ls) == pytest.approx(float(lt), rel=1e-6)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_t),
                               atol=1e-6)
    for a, b in zip(gs, gt):
        scale = max(float(np.max(np.abs(np.asarray(a)))), 1e-8)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-6)

    # a second focal through the SAME jitted fn (no recompile contract is
    # behavioral: different value, still correct output)
    (_, img2), _ = jax.value_and_grad(loss_traced, argnums=(2,),
                                      has_aux=True)(
        jnp.float32(cam["tan_fovx"] * 1.5), jnp.float32(cam["tan_fovy"]),
        *args)
    assert not np.array_equal(np.asarray(img2), np.asarray(img_t))

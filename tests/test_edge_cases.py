"""Robustness edge cases: degenerate inputs must render finite, not crash.

The reference guards only NaN-epsilons (forward.py:255, backward.py:377);
these tests pin the behaviors a production service depends on.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests import scenes

from gstpu.config import RenderSettings
from gstpu.ops.rasterize import render


def _render(pts, scales, rotations, opacities, shs, cam, pair_capacity=1 << 12):
    settings = RenderSettings(width=cam["width"], height=cam["height"],
                              pair_capacity=pair_capacity)
    j = jnp.asarray

    def f(*args):
        return render(settings, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                      *args, j(cam["view"]), j(cam["proj"]), j(cam["campos"]),
                      jnp.zeros(3, jnp.float32), None, jnp.int32(0))

    return jax.jit(f)(j(pts), j(scales), j(rotations), j(opacities), j(shs))


def _scene(n=16, **kw):
    rng = np.random.default_rng(0)
    cam = scenes.example_camera(width=32, height=32)
    return cam, scenes.random_scene(rng, n=n, **kw)


def test_all_behind_camera():
    cam, (pts, shs, scales, rotations, opacities) = _scene()
    pts[:, 2] = 100.0  # far behind (view looks toward -z in this fixture)
    img, depth, aux = _render(pts, scales, rotations, opacities, shs, cam)
    assert np.all(np.asarray(img) == 0.0)
    assert int(aux.num_pairs) == 0


def test_zero_opacity_renders_background():
    cam, (pts, shs, scales, rotations, opacities) = _scene()
    img, _, _ = _render(pts, scales, rotations, np.zeros_like(opacities), shs,
                        cam)
    assert np.all(np.asarray(img) == 0.0)
    assert np.all(np.isfinite(np.asarray(img)))


def test_zero_length_quaternion_is_finite():
    cam, (pts, shs, scales, rotations, opacities) = _scene()
    rotations[:4] = 0.0  # degenerate — reference quat math would divide by 0
    img, _, _ = _render(pts, scales, rotations, opacities, shs, cam)
    assert np.all(np.isfinite(np.asarray(img)))


def test_huge_scales_overflow_reported_not_crash():
    cam, (pts, shs, scales, rotations, opacities) = _scene()
    scales[:] = 50.0  # each splat covers the whole screen (4 tiles each)
    img, _, aux = _render(pts, scales, rotations, opacities, shs, cam,
                          pair_capacity=1 << 5)
    # the pair list overflows the tiny capacity: reported, output still finite
    assert int(aux.num_pairs) > (1 << 5)
    assert np.all(np.isfinite(np.asarray(img)))


def test_gradients_finite_on_degenerate_scene():
    cam, (pts, shs, scales, rotations, opacities) = _scene()
    rotations[:4] = 0.0
    opacities[4:8] = 0.0
    pts[8:10, 2] = 100.0
    settings = RenderSettings(width=32, height=32, pair_capacity=1 << 12)
    j = jnp.asarray

    def loss(*args):
        img, _, _ = render(settings, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                           *args, j(cam["view"]), j(cam["proj"]),
                           j(cam["campos"]), jnp.zeros(3, jnp.float32),
                           None, jnp.int32(0))
        return jnp.sum(img)

    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(
        j(pts), j(scales), j(rotations), j(opacities), j(shs))
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))

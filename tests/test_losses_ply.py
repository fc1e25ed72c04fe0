"""Losses (L1 / SSIM / PSNR / depth) and PLY round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from gstpu.ops.losses import (combined_loss, depth_loss, l1_loss,
                              l1_pixel_gradients, psnr, ssim)
from gstpu.utils.ply import load_ply, save_ply


def test_l1_matches_reference_normalization():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (32, 24, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (32, 24, 3)).astype(np.float32)
    # reference: sum of per-pixel channel |diff| / (W*H*3) (loss.py:148-176)
    want = np.sum(np.abs(a - b)) / (32 * 24 * 3)
    got = float(l1_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-6


def test_l1_pixel_gradients_are_grad_of_l1():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    analytic = np.asarray(l1_pixel_gradients(jnp.asarray(a), jnp.asarray(b)))
    auto = np.asarray(jax.grad(lambda x: l1_loss(x, jnp.asarray(b)))(
        jnp.asarray(a)))
    np.testing.assert_allclose(analytic, auto, atol=1e-8)


def test_ssim_properties():
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) > 0.999
    b = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    s = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert -1.0 <= s < 0.9
    # differentiable
    g = jax.grad(lambda x: ssim(x, jnp.asarray(b)))(jnp.asarray(a))
    assert np.isfinite(np.asarray(g)).all()


def test_combined_loss_lambda():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
    l1 = float(l1_loss(a, b))
    assert abs(float(combined_loss(a, b, 0.0)) - l1) < 1e-7
    lam = 0.2
    want = (1 - lam) * l1 + lam * (1 - float(ssim(a, b)))
    assert abs(float(combined_loss(a, b, lam)) - want) < 1e-6


def test_depth_loss_masked():
    d1 = jnp.ones((8, 8)) * 2.0
    d2 = jnp.ones((8, 8)) * 1.0
    mask = jnp.zeros((8, 8)).at[:4].set(1.0)
    # reference: sum(|diff| * mask) / (W*H) (loss.py:271-303)
    assert abs(float(depth_loss(d1, d2, mask)) - (32 * 1.0) / 64) < 1e-6


def test_psnr():
    a = jnp.zeros((4, 4, 3))
    b = jnp.full((4, 4, 3), 0.1)
    assert abs(float(psnr(a, b)) - 20.0) < 1e-3


def test_ply_round_trip(tmp_path):
    rng = np.random.default_rng(4)
    n = 17
    params = {
        "positions": rng.normal(0, 1, (n, 3)).astype(np.float32),
        "scales": rng.uniform(0.01, 1, (n, 3)).astype(np.float32),
        "rotations": rng.normal(0, 1, (n, 4)).astype(np.float32),
        "opacities": rng.uniform(0, 1, n).astype(np.float32),
        "shs": rng.normal(0, 0.3, (n, 16, 3)).astype(np.float32),
    }
    path = tmp_path / "pc.ply"
    save_ply(params, path, n)
    loaded = load_ply(path)
    for k in params:
        np.testing.assert_allclose(loaded[k], params[k], atol=1e-6, err_msg=k)


def test_ply_parameterization_round_trip_and_detection(tmp_path):
    """--activated checkpoints store log-scales/logit-opacities (official
    3DGS on-disk convention); loading one as raw gave screen-covering splats
    and a 54 GB binning allocation (BENCH_r04 trained_scene_error)."""
    from gstpu.utils.ply import detect_parameterization, render_space_params

    rng = np.random.default_rng(5)
    n = 9
    scales = rng.uniform(0.01, 0.2, (n, 3)).astype(np.float32)
    opac = rng.uniform(0.05, 0.95, n).astype(np.float32)
    stored = {
        "positions": rng.normal(0, 1, (n, 3)).astype(np.float32),
        "scales": np.log(scales),
        "opacities": np.log(opac / (1 - opac)),
        "rotations": np.tile([0, 0, 0, 1.0], (n, 1)).astype(np.float32),
        "shs": rng.normal(0, 0.3, (n, 16, 3)).astype(np.float32),
    }
    path = tmp_path / "act.ply"
    save_ply(stored, path, n, parameterization="activated")
    loaded = load_ply(path)
    # explicit comment round-trips
    assert loaded["parameterization"] == "activated"
    rp = render_space_params(loaded)
    np.testing.assert_allclose(rp["scales"], scales, rtol=1e-5)
    np.testing.assert_allclose(rp["opacities"], opac, rtol=1e-5)
    assert "parameterization" not in rp

    # comment-less foreign PLY: classified by value ranges
    save_ply(stored, tmp_path / "foreign.ply", n)
    foreign = load_ply(tmp_path / "foreign.ply")
    assert "parameterization" not in foreign
    assert detect_parameterization(foreign) == "activated"

    # raw (reference Q2) values pass through untouched
    raw = {**stored, "scales": scales, "opacities": opac}
    save_ply(raw, tmp_path / "raw.ply", n, parameterization="raw")
    loaded_raw = load_ply(tmp_path / "raw.ply")
    assert detect_parameterization(loaded_raw) == "raw"
    np.testing.assert_allclose(
        render_space_params(loaded_raw)["scales"], scales, rtol=1e-6)


def test_ply_header_matches_3dgs_schema(tmp_path):
    params = {
        "positions": np.zeros((2, 3), np.float32),
        "scales": np.ones((2, 3), np.float32),
        "rotations": np.tile([0, 0, 0, 1.0], (2, 1)).astype(np.float32),
        "opacities": np.ones(2, np.float32),
        "shs": np.zeros((2, 16, 3), np.float32),
    }
    path = tmp_path / "pc.ply"
    save_ply(params, path, 2)
    header = path.read_bytes().split(b"end_header")[0].decode()
    for field in ["x", "y", "z", "scale_0", "opacity", "rot_x", "rot_w",
                  "red", "green", "blue", "f_dc_0", "f_rest_0", "f_rest_44"]:
        assert f" {field}" in header, field
    assert "element vertex 2" in header


def test_combined_loss_ssim_gradient_flows():
    """λ_dssim > 0 trains: the SSIM term is differentiable (the reference
    defines SSIM but never implemented its gradient, loss.py:243 TODO)."""
    import jax
    from gstpu.ops.losses import combined_loss

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    loss, grad = jax.value_and_grad(
        lambda x: combined_loss(x, tgt, lambda_dssim=0.2))(img)
    assert np.isfinite(float(loss))
    g = np.asarray(grad)
    assert np.all(np.isfinite(g)) and np.abs(g).max() > 0
    # λ=0 must reduce to pure L1 pixel gradients
    g0 = np.asarray(jax.grad(
        lambda x: combined_loss(x, tgt, lambda_dssim=0.0))(img))
    np.testing.assert_allclose(
        g0, np.sign(np.asarray(img) - np.asarray(tgt)) / (32 * 32 * 3),
        atol=1e-7)

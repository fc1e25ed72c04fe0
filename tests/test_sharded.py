"""Multi-device sharding on a virtual 8-device CPU mesh (SURVEY §4e):
sharded render == single-device render; sharded train step == single-device
gradients (modulo reduction order)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import scenes

from gstpu.config import GSConfig, RenderSettings
from gstpu.optim import init_adam_state, schedule_lrs, adam_step
from gstpu.ops.rasterize import render
from gstpu.parallel import make_mesh, make_sharded_render, make_sharded_train_step
from gstpu.parallel.sharded import pad_targets_to_grid

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")

BG = np.zeros(3, np.float32)


def test_pad_targets_to_grid_channelless_needs_padding():
    """(B, H, W) depth targets at a height that is NOT a multiple of
    n_model*16 must pad and permute exactly like the channelled path
    (regression: jnp.pad was called with 4-D pad widths on 3-D input —
    only surfaced at heights needing padding, e.g. the 800-px dryrun)."""
    from gstpu.config import RenderSettings

    settings = RenderSettings(width=80, height=80, pair_capacity=1 << 10)
    x3 = np.arange(3 * 80 * 80, dtype=np.float32).reshape(3, 80, 80)
    out3 = np.asarray(pad_targets_to_grid(jnp.asarray(x3), settings,
                                          n_model=3))
    out4 = np.asarray(pad_targets_to_grid(
        jnp.asarray(np.repeat(x3[..., None], 3, axis=-1)), settings,
        n_model=3))
    # grid_y=5 -> band_rows=2 -> padded height 3*2*16=96
    assert out3.shape == (3, 96, 80)
    np.testing.assert_array_equal(out3, out4[..., 0])


def _scene(seed=0, n=64):
    rng = np.random.default_rng(seed)
    cam = scenes.example_camera(width=64, height=64)  # grid_y=4
    pts, shs, scales, rotations, opacities = scenes.random_scene(rng, n=n)
    params = {"positions": jnp.asarray(pts), "scales": jnp.asarray(scales),
              "rotations": jnp.asarray(rotations),
              "opacities": jnp.asarray(opacities), "shs": jnp.asarray(shs)}
    alive = jnp.ones(n, bool)
    return cam, params, alive


def test_sharded_render_matches_single_device():
    cam, params, alive = _scene()
    settings = RenderSettings(width=64, height=64, pair_capacity=1 << 13)
    j = jnp.asarray

    single, _, _ = render(settings, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                          params["positions"], params["scales"],
                          params["rotations"], params["opacities"],
                          params["shs"], j(cam["view"]), j(cam["proj"]),
                          j(cam["campos"]), j(BG), alive, jnp.int32(0))

    mesh = make_mesh(n_data=2, n_model=4)
    run = make_sharded_render(settings, mesh, cam["tan_fovx"], cam["tan_fovy"])
    img = run(params, alive, j(cam["view"]), j(cam["proj"]),
              j(cam["campos"]), j(BG))
    np.testing.assert_allclose(np.asarray(img), np.asarray(single), atol=1e-5)


def test_sharded_render_odd_n_rounds_up_and_keeps_fast_path():
    """N not divisible by the model axis: make_sharded_render pads with dead
    Gaussians so the sliced per-Gaussian chain stays engaged — the fallback
    warning (ops/rasterize._warn_slice_fallback) must NOT fire, and the image
    must still match the single-device render (VERDICT r3 weak #4)."""
    import warnings

    cam, params, alive = _scene(seed=3, n=61)          # 61 % 4 != 0
    settings = RenderSettings(width=64, height=64, pair_capacity=1 << 13)
    j = jnp.asarray

    single, _, _ = render(settings, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                          params["positions"], params["scales"],
                          params["rotations"], params["opacities"],
                          params["shs"], j(cam["view"]), j(cam["proj"]),
                          j(cam["campos"]), j(BG), alive, jnp.int32(0))

    mesh = make_mesh(n_data=2, n_model=4)
    run = make_sharded_render(settings, mesh, cam["tan_fovx"], cam["tan_fovy"])
    with warnings.catch_warnings():
        # escalate the fallback warning: rounding must prevent it
        warnings.simplefilter("error", RuntimeWarning)
        img = run(params, alive, j(cam["view"]), j(cam["proj"]),
                  j(cam["campos"]), j(BG))
    np.testing.assert_allclose(np.asarray(img), np.asarray(single), atol=1e-5)


def test_sharded_train_step_matches_single_device_grads():
    cam, params, alive = _scene(seed=1)
    cfg = GSConfig()
    settings = RenderSettings(width=64, height=64, pair_capacity=1 << 13)
    j = jnp.asarray
    rng = np.random.default_rng(2)
    target = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)

    # single-device reference grads (L1 loss)
    def loss_fn(p):
        img, _, _ = render(settings, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                           p["positions"], p["scales"], p["rotations"],
                           p["opacities"], p["shs"], j(cam["view"]),
                           j(cam["proj"]), j(cam["campos"]), j(BG), alive,
                           jnp.int32(0))
        return jnp.mean(jnp.abs(img - j(target)))

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)

    mesh = make_mesh(n_data=2, n_model=4)
    step = make_sharded_train_step(settings, cfg, mesh)
    tans = (jnp.full((2,), cam["tan_fovx"], jnp.float32),
            jnp.full((2,), cam["tan_fovy"], jnp.float32))
    adam = init_adam_state(params)
    views = jnp.tile(j(cam["view"])[None], (2, 1, 1))
    projs = jnp.tile(j(cam["proj"])[None], (2, 1, 1))
    camposes = jnp.tile(j(cam["campos"])[None], (2, 1))
    targets = pad_targets_to_grid(jnp.tile(j(target)[None], (2, 1, 1, 1)),
                                  settings, n_model=4)
    new_p, new_adam, loss, pos_grads, num_pairs, _it = step(
        params, adam, alive, views, projs, camposes, *tans, targets,
        jnp.int32(0))

    # identical cameras on both data groups -> loss == single-device L1
    assert abs(float(loss) - float(ref_loss)) < 1e-6
    # grads: both data shards saw the same camera, so psum doubles them...
    # no: loss is normalized by n_data, so grads match the single-camera case.
    np.testing.assert_allclose(np.asarray(pos_grads),
                               np.asarray(ref_grads["positions"]),
                               atol=1e-6)

    # the sharded Adam update equals the single-device Adam update
    lrs = schedule_lrs(cfg, jnp.int32(0))
    want_p, _ = adam_step(params, ref_grads, adam, lrs, jnp.int32(0), cfg,
                          alive=alive)
    for k in params:
        # 3e-6: the reduce-scatter reassociates the f32 gradient sums
        np.testing.assert_allclose(np.asarray(new_p[k]),
                                   np.asarray(want_p[k]), atol=3e-6,
                                   err_msg=k)


def test_sharded_train_step_dssim_matches_single_device():
    """λ_dssim > 0 on the sharded step: the SSIM term is computed BAND-LOCAL
    via a 5-row halo exchange over 'model' (VERDICT r2 item 6 — no more
    full-image all_gather + replicated SSIM per device) and must match the
    single-device combined loss and gradients."""
    from gstpu.ops.losses import combined_loss

    cam, params, alive = _scene(seed=7, n=48)
    cfg = GSConfig(lambda_dssim=0.2)
    settings = RenderSettings(width=64, height=64, pair_capacity=1 << 13)
    j = jnp.asarray
    rng = np.random.default_rng(8)
    target = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)

    def loss_fn(p):
        img, _, _ = render(settings, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                           p["positions"], p["scales"], p["rotations"],
                           p["opacities"], p["shs"], j(cam["view"]),
                           j(cam["proj"]), j(cam["campos"]), j(BG), alive,
                           jnp.int32(0))
        return combined_loss(img, j(target), cfg.lambda_dssim)

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)

    mesh = make_mesh(n_data=2, n_model=4)
    step = make_sharded_train_step(settings, cfg, mesh)
    tans = (jnp.full((2,), cam["tan_fovx"], jnp.float32),
            jnp.full((2,), cam["tan_fovy"], jnp.float32))
    adam = init_adam_state(params)
    views = jnp.tile(j(cam["view"])[None], (2, 1, 1))
    projs = jnp.tile(j(cam["proj"])[None], (2, 1, 1))
    camposes = jnp.tile(j(cam["campos"])[None], (2, 1))
    targets = pad_targets_to_grid(jnp.tile(j(target)[None], (2, 1, 1, 1)),
                                  settings, n_model=4)
    _, _, loss, pos_grads, _, _ = step(
        params, adam, alive, views, projs, camposes, *tans, targets,
        jnp.int32(0))
    assert abs(float(loss) - float(ref_loss)) < 1e-5
    scale = max(float(jnp.max(jnp.abs(ref_grads["positions"]))), 1e-8)
    np.testing.assert_allclose(np.asarray(pos_grads) / scale,
                               np.asarray(ref_grads["positions"]) / scale,
                               atol=2e-5)


def test_sharded_train_step_depth_matches_single_device():
    """λ_depth > 0 on the sharded step: depth targets/masks band-shard like
    color targets and the masked inverse-depth L1 matches the single-device
    loss and gradients (VERDICT r2 weak #7: this used to be a hard
    NotImplementedError under a mesh)."""
    from gstpu.ops.losses import depth_loss

    cam, params, alive = _scene(seed=9, n=48)
    cfg = GSConfig(lambda_depth=0.5, depth_scale=2.0)
    settings = RenderSettings(width=64, height=64, pair_capacity=1 << 13)
    j = jnp.asarray
    rng = np.random.default_rng(10)
    target = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    tdepth = rng.uniform(0, 1, (64, 64)).astype(np.float32)
    dmask = (rng.uniform(0, 1, (64, 64)) > 0.3).astype(np.float32)

    def loss_fn(p):
        img, depth, _ = render(settings, cam["tan_fovx"], cam["tan_fovy"],
                               1.0, p["positions"], p["scales"],
                               p["rotations"], p["opacities"], p["shs"],
                               j(cam["view"]), j(cam["proj"]),
                               j(cam["campos"]), j(BG), alive, jnp.int32(0))
        return jnp.mean(jnp.abs(img - j(target))) + cfg.lambda_depth * \
            depth_loss(depth, cfg.depth_scale * j(tdepth), j(dmask))

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)

    mesh = make_mesh(n_data=2, n_model=4)
    step = make_sharded_train_step(settings, cfg, mesh)
    tans = (jnp.full((2,), cam["tan_fovx"], jnp.float32),
            jnp.full((2,), cam["tan_fovy"], jnp.float32))
    adam = init_adam_state(params)
    views = jnp.tile(j(cam["view"])[None], (2, 1, 1))
    projs = jnp.tile(j(cam["proj"])[None], (2, 1, 1))
    camposes = jnp.tile(j(cam["campos"])[None], (2, 1))
    targets = pad_targets_to_grid(jnp.tile(j(target)[None], (2, 1, 1, 1)),
                                  settings, n_model=4)
    tdepths = pad_targets_to_grid(jnp.tile(j(tdepth)[None], (2, 1, 1)),
                                  settings, n_model=4)
    dmasks = pad_targets_to_grid(jnp.tile(j(dmask)[None], (2, 1, 1)),
                                 settings, n_model=4)
    _, _, loss, pos_grads, _, _ = step(
        params, adam, alive, views, projs, camposes, *tans, targets,
        jnp.int32(0), tdepths, dmasks)
    assert abs(float(loss) - float(ref_loss)) < 1e-5
    scale = max(float(jnp.max(jnp.abs(ref_grads["positions"]))), 1e-8)
    np.testing.assert_allclose(np.asarray(pos_grads) / scale,
                               np.asarray(ref_grads["positions"]) / scale,
                               atol=2e-5)


def test_sharded_two_distinct_cameras_average():
    """Data-parallel camera batching: loss is the mean over the batch."""
    cam, params, alive = _scene(seed=3, n=32)
    cfg = GSConfig()
    settings = RenderSettings(width=64, height=64, pair_capacity=1 << 13)
    j = jnp.asarray
    rng = np.random.default_rng(4)
    t1 = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    t2 = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)

    def loss_for(t):
        img, _, _ = render(settings, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                           params["positions"], params["scales"],
                           params["rotations"], params["opacities"],
                           params["shs"], j(cam["view"]), j(cam["proj"]),
                           j(cam["campos"]), j(BG), alive, jnp.int32(0))
        return jnp.mean(jnp.abs(img - j(t)))

    want = (float(loss_for(t1)) + float(loss_for(t2))) / 2

    mesh = make_mesh(n_data=2, n_model=4)
    step = make_sharded_train_step(settings, cfg, mesh)
    tans = (jnp.full((2,), cam["tan_fovx"], jnp.float32),
            jnp.full((2,), cam["tan_fovy"], jnp.float32))
    adam = init_adam_state(params)
    views = jnp.tile(j(cam["view"])[None], (2, 1, 1))
    projs = jnp.tile(j(cam["proj"])[None], (2, 1, 1))
    camposes = jnp.tile(j(cam["campos"])[None], (2, 1))
    targets = pad_targets_to_grid(
        jnp.stack([j(t1), j(t2)]), settings, n_model=4)
    _, _, loss, _, _, _ = step(params, adam, alive, views, projs,
                               camposes, *tans, targets, jnp.int32(0))
    assert abs(float(loss) - want) < 1e-6


def test_sharded_two_distinct_focals_average():
    """Per-view intrinsics under 'data': each camera in the batch renders
    with its OWN tan_fov (multi-focal rigs), and the batched loss equals the
    mean of the per-camera single-device losses computed with those tans."""
    cam, params, alive = _scene(seed=5, n=32)
    cfg = GSConfig()
    settings = RenderSettings(width=64, height=64, pair_capacity=1 << 13)
    j = jnp.asarray
    rng = np.random.default_rng(6)
    t1 = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    t2 = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    tx2 = cam["tan_fovx"] * 1.4      # second camera: different focal pair
    ty2 = cam["tan_fovy"] * 0.8

    def loss_for(t, tx, ty):
        img, _, _ = render(settings, tx, ty, 1.0,
                           params["positions"], params["scales"],
                           params["rotations"], params["opacities"],
                           params["shs"], j(cam["view"]), j(cam["proj"]),
                           j(cam["campos"]), j(BG), alive, jnp.int32(0))
        return jnp.mean(jnp.abs(img - j(t)))

    want = (float(loss_for(t1, cam["tan_fovx"], cam["tan_fovy"]))
            + float(loss_for(t2, tx2, ty2))) / 2
    # sanity: the two focals must actually change the render
    assert abs(float(loss_for(t2, tx2, ty2))
               - float(loss_for(t2, cam["tan_fovx"], cam["tan_fovy"]))) > 1e-5

    mesh = make_mesh(n_data=2, n_model=4)
    step = make_sharded_train_step(settings, cfg, mesh)
    tans = (jnp.asarray([cam["tan_fovx"], tx2], jnp.float32),
            jnp.asarray([cam["tan_fovy"], ty2], jnp.float32))
    adam = init_adam_state(params)
    views = jnp.tile(j(cam["view"])[None], (2, 1, 1))
    projs = jnp.tile(j(cam["proj"])[None], (2, 1, 1))
    camposes = jnp.tile(j(cam["campos"])[None], (2, 1))
    targets = pad_targets_to_grid(
        jnp.stack([j(t1), j(t2)]), settings, n_model=4)
    _, _, loss, _, _, _ = step(params, adam, alive, views, projs,
                               camposes, *tans, targets, jnp.int32(0))
    assert abs(float(loss) - want) < 2e-6


def test_sharded_render_pallas_matches_xla():
    """The Pallas kernels compose with the tile-banded multi-chip path."""
    import dataclasses

    cam, params, alive = _scene(seed=3)
    base = RenderSettings(width=64, height=64, pair_capacity=1 << 13)
    j = jnp.asarray
    mesh = make_mesh(n_data=1, n_model=4, devices=jax.devices()[:4])
    imgs = {}
    for name, s in [("xla", base),
                    ("pallas", dataclasses.replace(base, use_pallas=True,
                                                   pallas_interpret=True))]:
        run = make_sharded_render(s, mesh, cam["tan_fovx"], cam["tan_fovy"])
        imgs[name] = np.asarray(run(params, alive, j(cam["view"]),
                                    j(cam["proj"]), j(cam["campos"]), j(BG)))
    np.testing.assert_allclose(imgs["pallas"], imgs["xla"], atol=1e-5)


def test_sharded_render_strided_rows():
    """rows_per > 1: device d owns round-robin tile rows [d::n_model]; the
    reassembled image must equal the single-device render."""
    cam, params, alive = _scene(seed=4)
    settings = RenderSettings(width=64, height=64, pair_capacity=1 << 13)
    j = jnp.asarray
    single, _, _ = render(settings, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                          params["positions"], params["scales"],
                          params["rotations"], params["opacities"],
                          params["shs"], j(cam["view"]), j(cam["proj"]),
                          j(cam["campos"]), j(BG), alive, jnp.int32(0))
    mesh = make_mesh(n_data=1, n_model=2, devices=jax.devices()[:2])
    run = make_sharded_render(settings, mesh, cam["tan_fovx"], cam["tan_fovy"])
    img = run(params, alive, j(cam["view"]), j(cam["proj"]),
              j(cam["campos"]), j(BG))
    np.testing.assert_allclose(np.asarray(img), np.asarray(single), atol=1e-5)


def test_sharded_render_strided_rows_pallas():
    """Strided rows (rows_per > 1) compose with the Pallas kernels too."""
    import dataclasses

    cam, params, alive = _scene(seed=5)
    base = RenderSettings(width=64, height=64, pair_capacity=1 << 13)
    pal = dataclasses.replace(base, use_pallas=True, pallas_interpret=True)
    j = jnp.asarray
    mesh = make_mesh(n_data=1, n_model=2, devices=jax.devices()[:2])
    imgs = {}
    for name, s in (("xla", base), ("pallas", pal)):
        run = make_sharded_render(s, mesh, cam["tan_fovx"], cam["tan_fovy"])
        imgs[name] = np.asarray(run(params, alive, j(cam["view"]),
                                    j(cam["proj"]), j(cam["campos"]), j(BG)))
    np.testing.assert_allclose(imgs["pallas"], imgs["xla"], atol=1e-5)

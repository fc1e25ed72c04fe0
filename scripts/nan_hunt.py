#!/usr/bin/env python
"""Replay training to just before the first NaN step, then dissect it.

Deterministic repro: --activated --lambda-dssim 0.2 --sh-warmup 1000 --pallas
on Lego with the 7000-iteration schedule NaNs at step 77 (tainting 265
Gaussians).  This script reruns steps 0..76 through the real Trainer, then
evaluates step 77 stage by stage with finiteness checks.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

STOP = 77


def finite(name, x):
    import jax.numpy as jnp
    arrs = x if isinstance(x, (tuple, list)) else [x]
    bad = 0
    for a in arrs:
        try:
            bad += int(jnp.sum(~jnp.isfinite(a)))
        except TypeError:
            pass
    print(f"  {name:24s} nonfinite={bad}")
    return bad


def main():
    import jax
    import jax.numpy as jnp

    from gstpu.config import GSConfig
    from gstpu.trainer import Trainer

    jax.config.update("jax_compilation_cache_dir", "/tmp/gstpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    cfg = GSConfig(num_iterations=7000, parameterization="activated",
                   lambda_dssim=0.2, lr_opac=0.05, schedule_opac=False,
                   sh_degree_interval=1000)
    tr = Trainer("/root/reference/data/lego", "/tmp/nanhunt", cfg,
                 use_pallas=jax.default_backend() == "tpu")
    tr.train(num_iterations=STOP)
    print("replayed", tr.iteration, "steps; pair cap", tr._pair_capacity,
          "kept cap", tr._kept_capacity)

    model, adam = tr.model, tr.adam
    finite("params", list(model.param_dict().values()))
    finite("adam.m", jax.tree_util.tree_leaves(adam))

    # reproduce step-77 camera draw (trainer draws one index per step from
    # default_rng(seed))
    rng = np.random.default_rng(cfg.seed)
    idx = None
    for _ in range(STOP + 1):
        idx = int(rng.integers(0, len(tr.train_data)))
    print("step-77 camera:", idx)

    settings = tr._settings(STOP)
    target = tr._targets[idx] if tr._preload else \
        jnp.asarray(tr.train_data.image(idx))

    from gstpu.models.gaussians import activate_params
    from gstpu.ops.losses import combined_loss
    from gstpu.ops.rasterize import render

    bg = jnp.asarray(cfg.background_color, jnp.float32)
    view, proj, campos = tr._views[idx], tr._projs[idx], tr._camposes[idx]

    p_act = activate_params(model.param_dict(), cfg.parameterization)
    finite("activated params", list(p_act.values()))

    @jax.jit
    def fwd(p):
        image, depth, aux = render(
            settings, tr.tan_fovx, tr.tan_fovy, cfg.scale_modifier,
            p["positions"], p["scales"], p["rotations"], p["opacities"],
            p["shs"], view, proj, campos, bg, model.alive, jnp.int32(0))
        return image, depth, aux

    image, depth, aux = fwd(p_act)
    finite("image", image)
    finite("depth", depth)
    finite("final_t", aux.final_t)
    print("  num_pairs", int(aux.num_pairs), "kept", int(aux.num_kept))

    @jax.jit
    def loss_and_grads(p):
        def loss_fn(pp):
            pa = activate_params(pp, cfg.parameterization)
            image, depth, aux = render(
                settings, tr.tan_fovx, tr.tan_fovy, cfg.scale_modifier,
                pa["positions"], pa["scales"], pa["rotations"],
                pa["opacities"], pa["shs"], view, proj, campos, bg,
                model.alive, jnp.int32(0))
            return combined_loss(image, target, cfg.lambda_dssim)
        return jax.value_and_grad(loss_fn)(p)

    loss, grads = loss_and_grads(model.param_dict())
    print("loss:", float(loss))
    for k, g in grads.items():
        n = int(jnp.sum(~jnp.isfinite(g)))
        print(f"  grad[{k:10s}] nonfinite={n}")
        if n:
            bad = np.where(~np.isfinite(np.asarray(g)).all(
                axis=tuple(range(1, g.ndim))))[0]
            print("    first bad gaussians:", bad[:10])

    # stage-level dissection if grads are bad
    if any(int(jnp.sum(~jnp.isfinite(g))) for g in grads.values()):
        from gstpu.ops import pallas_rasterize
        from gstpu.ops.rasterize import (_render_fwd, image_to_tiles)

        (out, residuals) = jax.jit(lambda p: _render_fwd(
            settings, tr.tan_fovx, tr.tan_fovy, cfg.scale_modifier,
            p["positions"], p["scales"], p["rotations"], p["opacities"],
            p["shs"], view, proj, campos, bg, model.alive,
            jnp.int32(0)))(p_act)
        (prep, pairs, layout, color, dacc, final_t, *_rest) = residuals
        finite("prep.xy", prep.xy)
        finite("prep.conic", prep.conic)
        finite("prep.rgb", prep.rgb)
        finite("prep.cov3d", prep.cov3d)
        finite("feat", layout)  # prepare_layout returns the (16, K+BLOCK) feat
        finite("color", color)

        @jax.jit
        def pix_cots(img_out, depth_out):
            def outer(img, dep):
                return combined_loss(img, target, cfg.lambda_dssim)
            return jax.grad(outer, argnums=(0, 1))(img_out, depth_out)
        ct_img, ct_depth = pix_cots(out[0], out[1])
        finite("ct_image", ct_img)
        dl_dpix = image_to_tiles(ct_img, settings)
        dl_dd = image_to_tiles(ct_depth, settings)

        pg = jax.jit(lambda: pallas_rasterize.composite_backward(
            prep, pairs, settings, color, final_t, dl_dpix, bg,
            row0=jnp.int32(0), layout=layout, depth_acc=dacc,
            dl_ddepth=dl_dd))()
        for name, x in zip(("d_color", "d_mean2d", "d_conic", "d_opac",
                            "d_invd"), pg):
            finite(name, x)


if __name__ == "__main__":
    main()

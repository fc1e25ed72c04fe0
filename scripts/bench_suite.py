#!/usr/bin/env python
"""Extended benchmark suite — one JSON line per metric.

Covers more of the performance surface than the single-number bench.py:
- render-only FPS (inference; the viewer-interop workload),
- fwd+bwd on the synthetic 100k-Gaussian scene (same as bench.py),
- fwd+bwd on a trained point cloud if one is given (--ply),
- a full jitted train step (render + loss + backward + fused Adam).

Timing uses the slope method (PERF_NOTES.md: the remote-TPU tunnel charges a
fixed ~27ms per host sync; the difference between two iteration counts
cancels it).
"""

import argparse
import json
import time

import numpy as np

WIDTH = HEIGHT = 800
N = 100_000


def _run(fn, args, iters):
    import jax
    out = None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def timeit(fn, *args, lo=3, hi=13):
    _run(fn, args, 2)
    a = _run(fn, args, lo)
    b = _run(fn, args, hi)
    return (b - a) / (hi - lo) * 1e3


def emit(metric, ms, **extra):
    print(json.dumps({"metric": metric, "value": round(ms, 3), "unit": "ms",
                      **({"extra": extra} if extra else {})}))


def main():
    import jax
    import jax.numpy as jnp

    from gstpu.config import GSConfig, RenderSettings
    from gstpu.models.gaussians import GaussianModel
    from gstpu.optim import init_adam_state
    from gstpu.ops.losses import l1_loss
    from gstpu.ops.rasterize import render
    from tests.scenes import example_camera, random_scene

    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", default=None,
                    help="also benchmark this trained point cloud")
    ap.add_argument("--dataset", default="/root/reference/data/lego")
    ap.add_argument("--no-pallas", action="store_true")
    args_cli = ap.parse_args()
    use_pallas = not args_cli.no_pallas and jax.default_backend() == "tpu"

    _ = int(jnp.sum(jnp.ones(8)))  # force the tunnel into sync mode

    rng = np.random.default_rng(0)
    cam = example_camera(width=WIDTH, height=HEIGHT)
    pts, shs, scales, rotations, opacities = random_scene(
        rng, n=N, extent=1.3, z_center=-10.0,
        opacity_range=(0.05, 0.9), scale_range=(0.01, 0.05))
    j = jnp.asarray
    arrs = (j(pts), j(scales), j(rotations), j(opacities), j(shs))
    cam_args = (j(cam["view"]), j(cam["proj"]), j(cam["campos"]),
                jnp.zeros(3, jnp.float32))
    target = j(rng.uniform(0, 1, (HEIGHT, WIDTH, 3)).astype(np.float32))
    settings = RenderSettings(width=WIDTH, height=HEIGHT,
                              pair_capacity=1 << 19, use_pallas=use_pallas)

    @jax.jit
    def fwd(m, s_, r, o, sh):
        img, _, _ = render(settings, cam["tan_fovx"], cam["tan_fovy"], 1.0,
                           m, s_, r, o, sh, *cam_args, None, jnp.int32(0))
        return img

    ms = timeit(fwd, *arrs)
    emit("render_only_ms_per_frame", ms, fps=round(1e3 / ms, 1),
         n_gaussians=N, resolution=f"{WIDTH}x{HEIGHT}", pallas=use_pallas)

    @jax.jit
    def fwd_bwd(m, s_, r, o, sh):
        def loss_fn(*p):
            img, _, _ = render(settings, cam["tan_fovx"], cam["tan_fovy"],
                               1.0, *p, *cam_args, None, jnp.int32(0))
            return l1_loss(img, target)
        return jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
            m, s_, r, o, sh)

    emit("rasterize_fwd_bwd_ms_per_frame", timeit(fwd_bwd, *arrs),
         n_gaussians=N, pallas=use_pallas)

    # full train step (render + loss + custom-VJP backward + fused Adam)
    from gstpu.trainer import Trainer  # noqa: F401 (documentation pointer)
    from gstpu.optim import adam_step, schedule_lrs
    cfg = GSConfig()
    cap = N
    model = GaussianModel(positions=arrs[0], scales=arrs[1],
                          rotations=arrs[2], opacities=arrs[3], shs=arrs[4],
                          alive=jnp.ones(cap, bool), n_alive=jnp.int32(cap))
    adam = init_adam_state(model.param_dict())

    @jax.jit
    def train_step(model, adam, it):
        params = model.param_dict()

        def loss_fn(p):
            img, _, aux = render(settings, cam["tan_fovx"], cam["tan_fovy"],
                                 1.0, p["positions"], p["scales"],
                                 p["rotations"], p["opacities"], p["shs"],
                                 *cam_args, model.alive, jnp.int32(0))
            return l1_loss(img, target), aux
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        lrs = schedule_lrs(cfg, it)
        new_p, new_adam = adam_step(params, grads, adam, lrs, it, cfg,
                                    alive=model.alive)
        return model.replace(**new_p), new_adam, loss

    emit("train_step_ms", timeit(train_step, model, adam, jnp.int32(0)),
         n_gaussians=N, pallas=use_pallas)

    if args_cli.ply:
        from gstpu.data.nerf import NerfSyntheticDataset
        from gstpu.utils.ply import load_ply, render_space_params
        data = NerfSyntheticDataset(args_cli.dataset, "train")
        params = render_space_params(load_ply(args_cli.ply))
        n = params["positions"].shape[0]
        tcam = data.camera(0)
        tset = RenderSettings(width=data.width, height=data.height,
                              pair_capacity=1 << 20, use_pallas=use_pallas)
        targs = (j(params["positions"]), j(params["scales"]),
                 j(params["rotations"]), j(params["opacities"]),
                 j(params["shs"].reshape(n, 16, 3)))
        tcam_args = (j(tcam["world_to_camera"]), j(tcam["full_proj_matrix"]),
                     j(tcam["camera_center"]), jnp.zeros(3, jnp.float32))
        ttarget = j(np.asarray(data.image(0)))

        @jax.jit
        def t_fwd(m, s_, r, o, sh):
            img, _, _ = render(tset, tcam["tan_fovx"], tcam["tan_fovy"], 1.0,
                               m, s_, r, o, sh, *tcam_args, None, jnp.int32(0))
            return img

        ms = timeit(t_fwd, *targs)
        emit("trained_scene_render_ms", ms, fps=round(1e3 / ms, 1),
             n_gaussians=int(n), pallas=use_pallas)

        @jax.jit
        def t_fwd_bwd(m, s_, r, o, sh):
            def loss_fn(*p):
                img, _, _ = render(tset, tcam["tan_fovx"], tcam["tan_fovy"],
                                   1.0, *p, *tcam_args, None, jnp.int32(0))
                return l1_loss(img, ttarget)
            return jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
                m, s_, r, o, sh)

        emit("trained_scene_fwd_bwd_ms", timeit(t_fwd_bwd, *targs),
             n_gaussians=int(n), pallas=use_pallas)


if __name__ == "__main__":
    main()

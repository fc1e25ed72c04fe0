#!/usr/bin/env python
"""Capture a jax.profiler trace of the render fwd+bwd (SURVEY §5 tracing row).

Writes a TensorBoard-compatible trace; view with
``tensorboard --logdir <out>`` or upload to Perfetto.

    python -m scripts.trace [--out /tmp/gstpu_trace] [--no-pallas]
"""

import argparse
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gstpu.config import RenderSettings
    from gstpu.ops.losses import l1_loss
    from gstpu.ops.rasterize import render
    from tests.scenes import example_camera, random_scene

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/gstpu_trace")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--size", type=int, default=800)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    cam = example_camera(width=args.size, height=args.size)
    pts, shs, scales, rotations, opacities = random_scene(
        rng, n=args.n, extent=1.3, z_center=-10.0,
        opacity_range=(0.05, 0.9), scale_range=(0.01, 0.05))
    j = jnp.asarray
    arrs = (j(pts), j(scales), j(rotations), j(opacities), j(shs))
    cam_args = (j(cam["view"]), j(cam["proj"]), j(cam["campos"]),
                jnp.zeros(3, jnp.float32))
    target = j(rng.uniform(0, 1, (args.size, args.size, 3)).astype(np.float32))
    settings = RenderSettings(width=args.size, height=args.size,
                              pair_capacity=1 << 19,
                              use_pallas=not args.no_pallas)

    @jax.jit
    def fwd_bwd(m, s_, r, o, sh):
        def loss_fn(*p):
            img, _, _ = render(settings, cam["tan_fovx"], cam["tan_fovy"],
                               1.0, *p, *cam_args, None, jnp.int32(0))
            return l1_loss(img, target)
        return jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
            m, s_, r, o, sh)

    jax.block_until_ready(fwd_bwd(*arrs))  # compile outside the trace
    with jax.profiler.trace(args.out):
        for _ in range(5):
            out = fwd_bwd(*arrs)
        jax.block_until_ready(out)
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Median-of-R in-process bench of the headline fwd+bwd (A/B harness).

bench.py's single slope measurement carries +-0.5-1 ms of tunnel noise
run-to-run; comparing binning variants at the ~0.5 ms level needs medians.
Prints each repeat and the median.  Usage: python -m scripts.r5_abbench [R]
"""
import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from gstpu.config import RenderSettings
from gstpu.ops.losses import l1_loss
from gstpu.ops.preprocess import preprocess as _pre
from gstpu.ops.rasterize import render, _render_fwd
from tests.scenes import example_camera, random_scene

R = int(sys.argv[1]) if len(sys.argv) > 1 else 7
WIDTH = HEIGHT = 800

rng = np.random.default_rng(0)
cam = example_camera(width=WIDTH, height=HEIGHT)
pts, shs, scales, rotations, opacities = random_scene(
    rng, n=100_000, extent=1.3, z_center=-10.0,
    opacity_range=(0.05, 0.9), scale_range=(0.01, 0.05))
j = jnp.asarray
args = (j(pts), j(scales), j(rotations), j(opacities), j(shs))
cam_args = (j(cam["view"]), j(cam["proj"]), j(cam["campos"]),
            jnp.zeros(3, jnp.float32))
target = j(rng.uniform(0, 1, (HEIGHT, WIDTH, 3)).astype(np.float32))

probe = RenderSettings(width=WIDTH, height=HEIGHT, tight_radius=True)
pr = jax.jit(lambda *a: _pre(
    *a, WIDTH, HEIGHT, cam["tan_fovx"], cam["tan_fovy"], probe.grid_x,
    probe.grid_y, 3, tight_radius=True))(*args, *cam_args[:3])
live = int(np.asarray(pr.tiles_touched).sum())
pair_capacity = -(-int(live * 1.05) // 8192) * 8192
probe_cull = dataclasses.replace(probe, pair_capacity=pair_capacity,
                                 pair_cull=True)
(_, _, probe_aux), _ = jax.jit(
    lambda *a: _render_fwd(probe_cull, cam["tan_fovx"], cam["tan_fovy"],
                           1.0, *a, *cam_args, None, jnp.int32(0)))(*args)
kept_capacity = -(-int(probe_aux.num_kept) * 21 // 20 // 8192) * 8192
settings = RenderSettings(width=WIDTH, height=HEIGHT,
                          pair_capacity=pair_capacity,
                          kept_capacity=kept_capacity, pair_cull=True,
                          use_pallas=True, tight_radius=True)


@jax.jit
def fwd_bwd(means, scales_, rots, opac, shs_):
    def loss_fn(m, s, r, o, sh):
        img, _, _ = render(settings, cam["tan_fovx"], cam["tan_fovy"],
                           1.0, m, s, r, o, sh, *cam_args, None,
                           jnp.int32(0))
        return l1_loss(img, target)
    return jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
        means, scales_, rots, opac, shs_)


_ = float(jnp.sum(args[0]))


def run(iters):
    out = None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd_bwd(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


run(5)
vals = []
for i in range(R):
    ms = (run(25) - run(5)) / 20 * 1e3
    vals.append(ms)
    print(f"  rep {i}: {ms:.3f} ms", flush=True)
print(f"median of {R}: {float(np.median(vals)):.3f} ms "
      f"(min {min(vals):.3f}, max {max(vals):.3f})")

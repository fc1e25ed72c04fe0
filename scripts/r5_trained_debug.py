#!/usr/bin/env python
"""Isolate the trained-scene bench compile failure (BENCH_r04 trained_scene_error).

Runs the exact staging bench.py uses for the trained-scene companion, one
graph at a time, printing capacities and which compile crashes the remote
compile helper.
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
from gstpu.data.nerf import NerfSyntheticDataset
from gstpu.utils.ply import load_ply, render_space_params

ply = sys.argv[1] if len(sys.argv) > 1 else "assets/lego_trained.ply"
j = jnp.asarray
data = NerfSyntheticDataset("/root/reference/data/lego", "train")
p = render_space_params(load_ply(ply))
n = p["positions"].shape[0]
tcam = data.camera(0)
targs = (j(p["positions"]), j(p["scales"]), j(p["rotations"]),
         j(p["opacities"]), j(p["shs"].reshape(n, 16, 3)))
tcam_args = (j(tcam["world_to_camera"]), j(tcam["full_proj_matrix"]),
             j(tcam["camera_center"]), jnp.zeros(3, jnp.float32))
ttarget = j(np.asarray(data.image(0)))
W, H = data.width, data.height
print(f"n={n} res={W}x{H}", flush=True)

probe = RenderSettings(width=W, height=H, tight_radius=True)

t0 = time.time()
tprobe = jax.jit(lambda *a: _pre(
    *a, W, H, tcam["tan_fovx"], tcam["tan_fovy"], probe.grid_x,
    probe.grid_y, 3, tight_radius=True))(*targs, *tcam_args[:3])
tlive = int(np.asarray(tprobe.tiles_touched).sum())
print(f"stage1 preprocess ok ({time.time()-t0:.1f}s): live pairs={tlive}",
      flush=True)

tcap = -(-max(int(tlive * 1.05), 1) // 8192) * 8192
tp_cull = dataclasses.replace(probe, pair_capacity=tcap, pair_cull=True)
t0 = time.time()
(_, _, taux), _ = jax.jit(
    lambda *a: _render_fwd(tp_cull, tcam["tan_fovx"], tcam["tan_fovy"], 1.0,
                           *a, *tcam_args, None, jnp.int32(0)))(*targs)
kept = int(taux.num_kept)
print(f"stage2 XLA fwd probe ok ({time.time()-t0:.1f}s): "
      f"pair_cap={tcap} kept={kept}", flush=True)

tkept_cap = -(-max(kept * 21 // 20, 1) // 8192) * 8192
print(f"kept_cap={tkept_cap}", flush=True)

tset = dataclasses.replace(probe, pair_capacity=tcap, kept_capacity=tkept_cap,
                           pair_cull=True, use_pallas=True)

# stage 3: pallas forward only
t0 = time.time()
img, _, _ = jax.jit(lambda *a: render(
    tset, tcam["tan_fovx"], tcam["tan_fovy"], 1.0, *a, *tcam_args, None,
    jnp.int32(0)))(*targs)
jax.block_until_ready(img)
print(f"stage3 pallas fwd ok ({time.time()-t0:.1f}s)", flush=True)

# stage 4: pallas fwd+bwd
@jax.jit
def t_fwd_bwd(m, s_, r, o, sh):
    def loss_fn(*q):
        img, _, _ = render(tset, tcam["tan_fovx"], tcam["tan_fovy"], 1.0, *q,
                           *tcam_args, None, jnp.int32(0))
        return l1_loss(img, ttarget)
    return jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(m, s_, r, o, sh)

t0 = time.time()
out = t_fwd_bwd(*targs)
jax.block_until_ready(out)
print(f"stage4 pallas fwd+bwd ok ({time.time()-t0:.1f}s)", flush=True)
print("ALL OK", flush=True)

#!/usr/bin/env python
"""Field-level CPU-vs-TPU diff of the preprocess + render forward pass.

Round-2 found that --activated --lambda-dssim training converges on CPU but
stalls on TPU even on the pure-XLA path.  This isolates which preprocess
outputs diverge between backends (and under which matmul precision): run once
per backend, then compare the saved npz files.

    JAX_PLATFORMS=cpu python scripts/preprocess_backend_diff.py
    python scripts/preprocess_backend_diff.py              # on the TPU
    JAX_DEFAULT_MATMUL_PRECISION=float32 python scripts/preprocess_backend_diff.py
"""

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    from gstpu.config import GSConfig, RenderSettings
    from gstpu.models.gaussians import activate_params, init_model
    from gstpu.ops.binning import build_pairs
    from gstpu.ops.preprocess import preprocess
    from gstpu.ops.rasterize import render
    from gstpu.utils.camera import load_nerf_cameras

    cfg = GSConfig(num_points=5000, parameterization="activated",
                   lambda_dssim=0.2)
    model = init_model(jax.random.PRNGKey(cfg.seed), cfg)
    cams, _ = load_nerf_cameras("/root/reference/data/lego", "train")
    cam = cams[0]["camera"]
    w, h = cam.width, cam.height
    p = activate_params(model.param_dict(), cfg.parameterization)
    j = jnp.asarray

    settings = RenderSettings(width=w, height=h, pair_capacity=1 << 20,
                              sh_degree=0)
    prep = jax.jit(lambda *a: preprocess(
        *a, w, h, cam.tan_fovx, cam.tan_fovy, settings.grid_x,
        settings.grid_y, settings.sh_degree))(
        j(p["positions"]), j(p["scales"]), j(p["rotations"]),
        j(p["opacities"]), j(p["shs"]), j(cam.view), j(cam.proj),
        j(cam.campos))

    bg = jnp.zeros((3,), jnp.float32)
    image, depth, aux = jax.jit(lambda *a: render(
        settings, cam.tan_fovx, cam.tan_fovy, 1.0, *a))(
        j(p["positions"]), j(p["scales"]), j(p["rotations"]),
        j(p["opacities"]), j(p["shs"]), j(cam.view), j(cam.proj),
        j(cam.campos), bg, model.alive, jnp.int32(0))

    out = {"depth": prep.depth, "radius": prep.radii,
           "xy": prep.xy, "conic": prep.conic,
           "tiles_touched": prep.tiles_touched, "rect": prep.rect,
           "rgb": prep.rgb, "image": image, "img_depth": depth}
    out = {k: np.asarray(v) for k, v in out.items()}

    backend = jax.default_backend()
    prec = os.environ.get("JAX_DEFAULT_MATMUL_PRECISION", "default")
    tag = f"{backend}_{prec}"
    path = Path(f"/tmp/prep_diff_{tag}.npz")
    np.savez(path, **out)
    print(f"saved {path}")

    base = Path("/tmp/prep_diff_cpu_default.npz")
    if backend != "cpu" and base.exists():
        ref = np.load(base)
        for k in out:
            a, b = ref[k].astype(np.float64), out[k].astype(np.float64)
            d = np.abs(a - b).max()
            scale = max(np.abs(a).max(), 1e-12)
            print(f"{k:14s} maxdiff={d:.4e}  rel={d / scale:.4e}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""TPU-vs-CPU parity of the SSIM loss VALUE and GRADIENT.

Round-1 found one TPU miscompile in the SSIM window filter (losses.py
docstring).  The round-2 --lambda-dssim training runs converge on CPU but
stall on TPU with occasional NaNs — this isolates whether ssim() and its
backward are the divergence.

Run ON THE TPU: python scripts/ssim_tpu_check.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def run_backend(xs, ys):
    import jax
    import jax.numpy as jnp

    from gstpu.ops.losses import combined_loss, ssim

    outs = {}
    x, y = jnp.asarray(xs), jnp.asarray(ys)

    val = jax.jit(ssim)(x, y)
    g = jax.jit(jax.grad(lambda a: ssim(a, y)))(x)
    lc = jax.jit(lambda a: combined_loss(a, y, 0.2))(x)
    gc = jax.jit(jax.grad(lambda a: combined_loss(a, y, 0.2)))(x)
    outs["ssim"] = np.asarray(val)
    outs["dssim"] = np.asarray(g)
    outs["combined"] = np.asarray(lc)
    outs["dcombined"] = np.asarray(gc)
    return outs


def main():
    import jax

    rng = np.random.default_rng(0)
    h = w = 800
    xs = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    # target-like: correlated with xs (SSIM gradients are structure-driven)
    ys = np.clip(xs + 0.1 * rng.normal(size=(h, w, 3)).astype(np.float32),
                 0, 1).astype(np.float32)

    backend = jax.default_backend()
    out = run_backend(xs, ys)
    path = Path(f"/tmp/ssim_check_{backend}.npz")
    np.savez(path, **out)
    print(f"{backend}: ssim={out['ssim']:.6f} combined={out['combined']:.6f} "
          f"|dssim|max={np.abs(out['dssim']).max():.3e} "
          f"nonfinite={int((~np.isfinite(out['dssim'])).sum())}")

    other = Path(f"/tmp/ssim_check_{'cpu' if backend != 'cpu' else 'tpu'}.npz")
    if other.exists():
        ref = np.load(other)
        for k in out:
            d = np.abs(out[k] - ref[k]).max()
            scale = max(np.abs(ref[k]).max(), 1e-12)
            print(f"  {k:10s} maxdiff={d:.3e}  rel={d / scale:.3e}")


if __name__ == "__main__":
    main()

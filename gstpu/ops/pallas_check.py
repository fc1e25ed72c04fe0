"""Compiled-Pallas parity gate (VERDICT r1 item 8).

bench.py runs this in the SAME TPU session as the headline number so Mosaic
regressions cannot hide behind interpret-mode CI; it is also the
``GSTPU_TEST_TPU=1`` pytest gate (tests/test_tpu_compiled.py).

The comparison target is a stored golden of the XLA compositing path's
outputs (tests/golden/pallas_gate.npz, regenerate with
``python -m gstpu.ops.pallas_check`` on CPU) — compiling the XLA while_loop
path on the TPU just for the gate costs minutes, while the XLA path itself
is already pinned by the reference-executed goldens (tests/test_golden.py).
The gate therefore only compiles + runs the Pallas kernels (~30 s) and
checks them against the stored values with flip-tolerant thresholds
(keep-threshold pixels legitimately differ between contraction orders)."""

from __future__ import annotations

from pathlib import Path

import numpy as np

GOLDEN_PATH = Path(__file__).resolve().parents[2] / "tests" / "golden" \
    / "pallas_gate.npz"

N = 8_000
SIZE = 160
PAIR_CAPACITY = 1 << 16
SEED = 3


def _scene():
    import jax
    import jax.numpy as jnp

    from gstpu.config import RenderSettings
    from gstpu.ops.binning import build_pairs
    from gstpu.ops.preprocess import preprocess
    from tests.scenes import example_camera, random_scene

    rng = np.random.default_rng(SEED)
    cam = example_camera(width=SIZE, height=SIZE)
    pts, shs, scales, rotations, opacities = random_scene(
        rng, n=N, extent=1.3, z_center=-8.0,
        opacity_range=(0.05, 0.95), scale_range=(0.01, 0.08))
    j = jnp.asarray
    settings = RenderSettings(width=SIZE, height=SIZE,
                              pair_capacity=PAIR_CAPACITY)
    prep = jax.jit(lambda *a: preprocess(
        *a, SIZE, SIZE, cam["tan_fovx"], cam["tan_fovy"], settings.grid_x,
        settings.grid_y, 3))(
        j(pts), j(scales), j(rotations), j(opacities), j(shs),
        j(cam["view"]), j(cam["proj"]), j(cam["campos"]))
    pairs = jax.jit(lambda tt, r, d: build_pairs(
        tt, r, d, settings.grid_x, settings.num_tiles,
        settings.pair_capacity))(prep.tiles_touched, prep.rect, prep.depth)

    rng2 = np.random.default_rng(7)
    dl_dpix = j(rng2.normal(size=(settings.num_tiles, 256, 3))
                .astype(np.float32))
    ct_d = j(rng2.normal(size=(settings.num_tiles, 256)).astype(np.float32))
    bg = jnp.zeros(3, jnp.float32)
    return settings, prep, pairs, dl_dpix, ct_d, bg


def _run(settings, prep, pairs, dl_dpix, ct_d, bg, use_pallas: bool):
    import jax

    if use_pallas:
        from gstpu.ops.pallas_rasterize import (composite_backward,
                                                composite_forward)
    else:
        from gstpu.ops.rasterize import composite_backward, composite_forward

    c, d, t, nc = jax.jit(
        lambda pr, p: composite_forward(pr, p, settings))(prep, pairs)
    grads = jax.jit(lambda pr, p, c_, t_, dp, cd: composite_backward(
        pr, p, settings, c_, t_, dp, bg, depth_acc=d, dl_ddepth=cd))(
        prep, pairs, c, t, dl_dpix, ct_d)
    return ({"color": np.asarray(c), "depth": np.asarray(d),
             "final_t": np.asarray(t), "n_contrib": np.asarray(nc)},
            {k: np.asarray(v) for k, v in zip(
                ("d_color", "d_mean2d", "d_conic", "d_opac", "d_invdepth"),
                grads)})


def generate_golden(path: Path = GOLDEN_PATH) -> None:
    """Store the gate inputs (prep + pairs, CPU-computed — preprocess
    rounding differs across backends, so the kernels must see IDENTICAL
    inputs) and the XLA path's outputs (the XLA path itself is pinned by
    tests/test_golden.py)."""
    settings, prep, pairs, dl_dpix, ct_d, bg = _scene()
    fwd, bwd = _run(settings, prep, pairs, dl_dpix, ct_d, bg,
                    use_pallas=False)
    path.parent.mkdir(exist_ok=True)
    np.savez_compressed(
        path,
        **{f"prep_{k}": np.asarray(v) for k, v in prep._asdict().items()},
        **{f"pairs_{k}": np.asarray(v) for k, v in pairs._asdict().items()},
        dl_dpix=np.asarray(dl_dpix), ct_d=np.asarray(ct_d),
        **fwd, **{f"g_{k}": v for k, v in bwd.items()})
    print(f"wrote {path} (num_pairs={int(pairs.num_pairs)})")


def preprocess_backend_parity(golden_path: Path = GOLDEN_PATH):
    """Re-run ``preprocess`` on the CURRENT backend (the scene is
    deterministic from seeds) and compare against the stored CPU prep.

    This is the check that catches MXU-precision regressions: the round-2
    training stall traced to TPU's default-bf16 matmul passes in the
    projection (``ops/preprocess.py``), which the kernel gate could never
    see because it feeds the kernels STORED prep.  With explicit
    ``Precision.HIGHEST`` the backends agree to fp32 rounding; bf16 shows
    up as ~0.5 px of ``xy`` jitter at this scene scale."""
    g = np.load(golden_path)
    _, prep, _, _, _, _ = _scene()
    pix = np.abs(np.asarray(prep.xy) - g["prep_xy"]).max()
    depth = np.abs(np.asarray(prep.depth) - g["prep_depth"]).max()
    rgb = np.abs(np.asarray(prep.rgb) - g["prep_rgb"]).max()
    conic_scale = float(np.abs(g["prep_conic"]).max()) or 1.0
    conic = np.abs(np.asarray(prep.conic) - g["prep_conic"]).max() \
        / conic_scale
    # radii/tiles may flip on exact ties under fp32 reassociation
    tile_flips = float((np.asarray(prep.tiles_touched)
                        != g["prep_tiles_touched"]).mean())
    res = {"prep_xy_maxdiff_px": float(pix),
           "prep_depth_maxdiff": float(depth),
           "prep_rgb_maxdiff": float(rgb),
           "prep_conic_relmax": float(conic),
           "prep_tile_flip_frac": tile_flips}
    res["ok"] = bool(pix < 0.05 and depth < 1e-4 and rgb < 1e-4
                     and conic < 1e-3 and tile_flips < 0.01)
    return res


def compiled_parity_check(golden_path: Path = GOLDEN_PATH):
    """Run the compiled Pallas path on the current backend with the STORED
    inputs and compare to the stored XLA outputs.  Returns a dict with
    per-output diffs + ``ok``."""
    import jax
    import jax.numpy as jnp

    from gstpu.config import RenderSettings
    from gstpu.ops.binning import Pairs
    from gstpu.ops.preprocess import PreprocessOut

    g = np.load(golden_path)
    settings = RenderSettings(width=SIZE, height=SIZE,
                              pair_capacity=PAIR_CAPACITY)
    j = jnp.asarray
    prep = PreprocessOut(**{k: j(g[f"prep_{k}"])
                            for k in PreprocessOut._fields})
    pairs = Pairs(**{k: j(g[f"pairs_{k}"]) if f"pairs_{k}" in g
                     else j(g["pairs_num_pairs"])     # num_kept, older golden
                     for k in Pairs._fields})
    dl_dpix, ct_d = j(g["dl_dpix"]), j(g["ct_d"])
    bg = jnp.zeros(3, jnp.float32)
    fwd, bwd = _run(settings, prep, pairs, dl_dpix, ct_d, bg,
                    use_pallas=True)

    flips = fwd["n_contrib"] != g["n_contrib"]
    boundary = flips | (fwd["final_t"] < 6e-4) | (g["final_t"] < 6e-4)
    color_diff = float(np.max(np.where(boundary[:, :, None], 0.0,
                                       np.abs(fwd["color"] - g["color"]))))
    depth_diff = float(np.max(np.where(boundary, 0.0,
                                       np.abs(fwd["depth"] - g["depth"]))))
    result = {
        "backend": jax.default_backend(),
        "num_pairs": int(pairs.num_pairs),
        "flip_frac": float(flips.mean()),
        "fwd_color_maxdiff": color_diff,
        "fwd_depth_maxdiff": depth_diff,
    }
    grad_ok = True
    for k, v in bwd.items():
        want = g[f"g_{k}"]
        scale = float(np.max(np.abs(want))) or 1.0
        rel = float(np.max(np.abs(v - want))) / scale
        result[f"bwd_{k}_relmax"] = rel
        # flipped contributors shift a few Gaussians' gradient sums; 1e-3 of
        # the max-gradient scale bounds that while still catching real
        # Mosaic regressions (which show as O(1) garbage)
        grad_ok &= rel < 1e-3
    prep_res = preprocess_backend_parity(golden_path)
    prep_ok = prep_res.pop("ok")
    result.update(prep_res)
    result["prep_ok"] = prep_ok
    result["ok"] = bool(grad_ok and color_diff < 1e-5 and depth_diff < 1e-4
                        and flips.mean() < 0.05 and prep_ok)
    return result


if __name__ == "__main__":
    generate_golden()

"""Generate parity goldens by EXECUTING the reference's own kernels.

Round-1 VERDICT identified that every parity test compared against a
builder-written oracle transcription (tests/oracle/ref_numpy.py) that had
never been validated against running reference code.  This script closes
that loophole: it imports /root/reference's unmodified ``forward.py`` /
``backward.py`` under the NumPy Warp shim (tests/warp_shim) and records
their outputs as ``tests/golden/*.npz``.  ``tests/test_golden.py`` then
asserts oracle == goldens AND gstpu == goldens.

Usage:  python scripts/gen_golden.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests import scenes  # noqa: E402
from tests.warp_shim import load_reference  # noqa: E402

GOLDEN_DIR = Path(__file__).resolve().parents[1] / "tests" / "golden"


def run_case(name: str, cam, pts, shs, scales, rotations, opacities,
             ct_seed: int):
    fwd, bwd = load_reference()
    bg = np.zeros(3, np.float32)
    h, w = cam["height"], cam["width"]

    image, depth, buffers = fwd.render_gaussians(
        background=bg,
        means3D=pts,
        opacity=opacities,
        scales=scales,
        rotations=rotations,
        scale_modifier=1.0,
        viewmatrix=cam["view"],
        projmatrix=cam["proj"],
        tan_fovx=cam["tan_fovx"],
        tan_fovy=cam["tan_fovy"],
        image_height=h,
        image_width=w,
        sh=shs,
        degree=3,
        campos=cam["campos"],
    )

    rng = np.random.default_rng(ct_seed)
    dl_dpix = rng.normal(0, 1, (h, w, 3)).astype(np.float32)

    geom_buffer = {
        "radii": buffers["radii"],
        "means2D": buffers["points_xy_image"],
        "conic_opacity": buffers["conic_opacity"],
        "rgb": buffers["colors"],
        "clamped_state": buffers["clamped_state"],
    }
    binning_buffer = {"point_list": buffers["point_list"]}
    img_buffer = {"ranges": buffers["ranges"],
                  "final_Ts": buffers["final_Ts"],
                  "n_contrib": buffers["n_contrib"]}

    grads = bwd.backward(
        background=bg,
        means3D=pts,
        dL_dpixels=dl_dpix,
        opacity=opacities,
        shs=shs,
        scales=scales,
        rotations=rotations,
        scale_modifier=1.0,
        viewmatrix=cam["view"],
        projmatrix=cam["proj"],
        tan_fovx=cam["tan_fovx"],
        tan_fovy=cam["tan_fovy"],
        image_height=h,
        image_width=w,
        campos=cam["campos"],
        radii=buffers["radii"],
        means2D=buffers["points_xy_image"],
        conic_opacity=buffers["conic_opacity"],
        rgb=buffers["colors"],
        cov3Ds=buffers["cov3Ds"],
        clamped=buffers["clamped_state"],
        geom_buffer=geom_buffer,
        binning_buffer=binning_buffer,
        img_buffer=img_buffer,
        degree=3,
    )

    GOLDEN_DIR.mkdir(exist_ok=True)
    np.savez_compressed(
        GOLDEN_DIR / f"{name}.npz",
        # inputs (self-contained: tests must not depend on fixture drift)
        pts=pts, shs=shs, scales=scales, rotations=rotations,
        opacities=opacities, view=cam["view"], proj=cam["proj"],
        campos=cam["campos"], tan_fovx=cam["tan_fovx"],
        tan_fovy=cam["tan_fovy"], width=w, height=h, bg=bg,
        dl_dpix=dl_dpix,
        # forward outputs (reference-executed)
        image=buffers_np(image), depth=buffers_np(depth),
        radii=buffers_np(buffers["radii"]),
        xy=buffers_np(buffers["points_xy_image"]),
        depths=buffers_np(buffers["depths"]),
        conic_opacity=buffers_np(buffers["conic_opacity"]),
        rgb=buffers_np(buffers["colors"]),
        cov3d=buffers_np(buffers["cov3Ds"]),
        clamped=buffers_np(buffers["clamped_state"]),
        final_t=buffers_np(buffers["final_Ts"]),
        n_contrib=buffers_np(buffers["n_contrib"]),
        # backward outputs (reference-executed)
        d_mean3d=buffers_np(grads["dL_dmean3D"]),
        d_color=buffers_np(grads["dL_dcolor"]),
        d_shs=buffers_np(grads["dL_dshs"]),
        d_opacity=buffers_np(grads["dL_dopacity"]),
        d_scale=buffers_np(grads["dL_dscale"]),
        d_rot=buffers_np(grads["dL_drot"]),
        d_mean2d=buffers_np(grads["dL_dmean2D"]),
        d_conic=buffers_np(grads["dL_dconic"]),
    )
    print(f"{name}: image mean {buffers_np(image).mean():.6f}, "
          f"|d_mean3d| {np.abs(buffers_np(grads['dL_dmean3D'])).max():.6f}")


def buffers_np(x):
    return np.asarray(x.numpy() if hasattr(x, "numpy") else x)


def main():
    cam128 = scenes.example_camera(width=128, height=128)
    run_case("three_gaussians_128", cam128, *scenes.three_gaussian_scene(),
             ct_seed=100)

    cam64 = scenes.example_camera(width=64, height=64)
    rng = np.random.default_rng(0)
    run_case("random_s0_64", cam64,
             *scenes.random_scene(rng, n=80, opacity_range=(0.2, 0.9)),
             ct_seed=101)
    rng = np.random.default_rng(1)
    run_case("random_s1_64", cam64,
             *scenes.random_scene(rng, n=80, opacity_range=(0.7, 1.0)),
             ct_seed=102)


if __name__ == "__main__":
    main()

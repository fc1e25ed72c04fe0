"""Parity vs goldens produced by EXECUTING the reference's own kernels.

The goldens (tests/golden/*.npz, regenerate with scripts/gen_golden.py) come
from /root/reference's unmodified forward.py/backward.py run under the NumPy
Warp shim (tests/warp_shim).  This closes the round-1 oracle loophole: a
transcription error in tests/oracle/ref_numpy.py correlated with a gstpu
implementation error is now caught, because BOTH are checked against the
reference's actually-executing code:

  reference (shim-executed) == oracle == gstpu
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.oracle import ref_numpy

from gstpu.config import RenderSettings
from gstpu.ops.rasterize import render

GOLDEN_DIR = Path(__file__).parent / "golden"
# scene goldens only (the dir also holds the pallas-gate golden, which has a
# different schema, and train_compare.json)
CASES = sorted(p.stem for p in GOLDEN_DIR.glob("*.npz")
               if p.stem != "pallas_gate")

GRAD_KEYS = ["dL_dmean3D", "dL_dcolor", "dL_dshs", "dL_dopacity",
             "dL_dscale", "dL_drot", "dL_dmean2D", "dL_dconic"]
NPZ_KEYS = {"dL_dmean3D": "d_mean3d", "dL_dcolor": "d_color",
            "dL_dshs": "d_shs", "dL_dopacity": "d_opacity",
            "dL_dscale": "d_scale", "dL_drot": "d_rot",
            "dL_dmean2D": "d_mean2d", "dL_dconic": "d_conic"}


def _load(name):
    return np.load(GOLDEN_DIR / f"{name}.npz")


def _assert_close(a, b, name, atol=1e-4, outlier_frac=0.0, outlier_cap=1e-2):
    """max-scaled allclose; ``outlier_frac`` > 0 additionally permits that
    fraction of elements to deviate up to ``outlier_cap`` (keep-threshold
    flips shift a few Gaussians' gradient sums — see the forward test)."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    scale = max(np.max(np.abs(b)), 1e-8)
    err = np.abs(a - b) / scale
    if outlier_frac:
        bad = err > atol
        assert bad.mean() <= outlier_frac, (name, bad.mean())
        assert err.max() <= outlier_cap, (name, err.max())
    else:
        np.testing.assert_allclose(a / scale, b / scale, atol=atol,
                                   err_msg=name)


def test_goldens_exist():
    # Golden files are committed; they must be present for the suite to mean
    # anything.  Regenerate with `python scripts/gen_golden.py`.
    assert len(CASES) >= 3, CASES


@pytest.mark.parametrize("case", CASES)
def test_oracle_forward_matches_reference_golden(case):
    g = _load(case)
    img, depth, aux = ref_numpy.render(
        g["pts"], g["scales"], g["rotations"], g["opacities"], g["shs"],
        g["view"], g["proj"], g["campos"], int(g["width"]), int(g["height"]),
        float(g["tan_fovx"]), float(g["tan_fovy"]), degree=3, bg=g["bg"])
    _assert_close(img, g["image"], "image", atol=2e-5)
    _assert_close(depth, g["depth"], "depth", atol=2e-5)
    np.testing.assert_array_equal(np.asarray(aux["prep"]["radii"]),
                                  g["radii"])
    _assert_close(aux["final_t"], g["final_t"], "final_t", atol=2e-5)
    np.testing.assert_array_equal(np.asarray(aux["n_contrib"]),
                                  g["n_contrib"])


@pytest.mark.parametrize("case", CASES)
def test_oracle_backward_matches_reference_golden(case):
    g = _load(case)
    got = ref_numpy.backward(
        g["pts"], g["scales"], g["rotations"], g["opacities"], g["shs"],
        g["view"], g["proj"], g["campos"], int(g["width"]), int(g["height"]),
        float(g["tan_fovx"]), float(g["tan_fovy"]), degree=3, bg=g["bg"],
        dL_dpix=g["dl_dpix"])
    for key in GRAD_KEYS:
        want = g[NPZ_KEYS[key]]
        have = np.asarray(got[key])
        if key == "dL_dshs":
            want = want.reshape(have.shape)
        elif key == "dL_dmean2D" and want.shape[-1] == 3:
            want = want[:, : have.shape[-1]]
        elif key == "dL_dconic" and want.shape[-1] == 4:
            # reference vec4 layout: components (0, 1, 3) = (a, b, c)
            # (backward.py:297; SURVEY §2.2)
            want = want[:, [0, 1, 3]]
        _assert_close(have, want, key, atol=2e-4)


@pytest.mark.parametrize("case", CASES)
def test_gstpu_forward_matches_reference_golden(case):
    from gstpu.ops.rasterize import tiles_to_image

    g = _load(case)
    settings = RenderSettings(width=int(g["width"]), height=int(g["height"]),
                              pair_capacity=1 << 14)
    j = jnp.asarray
    img, depth, aux = render(
        settings, float(g["tan_fovx"]), float(g["tan_fovy"]), 1.0,
        j(g["pts"]), j(g["scales"]), j(g["rotations"]), j(g["opacities"]),
        j(g["shs"]), j(g["view"]), j(g["proj"]), j(g["campos"]), j(g["bg"]),
        None, jnp.int32(0))
    # Pixels where a contributor sits exactly on the α >= 1/255 or P >= 1e-4
    # threshold can flip under different (equally valid) f32 contraction
    # orders; exempt them via contributor-count mismatch (cf. test_pallas)
    # and require everything else to match to f32 rounding.
    n_contrib = np.asarray(tiles_to_image(aux.n_contrib, settings))
    flips = n_contrib != g["n_contrib"]
    assert flips.mean() < 0.02, flips.mean()
    ok = np.abs(np.asarray(img) - g["image"]) <= 5e-5
    assert np.all(ok | flips[:, :, None])
    dok = np.abs(np.asarray(depth) - g["depth"]) <= 5e-5
    assert np.all(dok | flips)
    np.testing.assert_array_equal(np.asarray(aux.radii), g["radii"])


@pytest.mark.parametrize("case", CASES)
def test_gstpu_gradients_match_reference_golden(case):
    g = _load(case)
    # strict parity incl. Q15's constant translation bias in dL_dmean3D
    settings = RenderSettings(width=int(g["width"]), height=int(g["height"]),
                              pair_capacity=1 << 14, parity=True,
                              grad_bias_parity=True)
    j = jnp.asarray

    def f(means, scales, rots, opac, shs):
        img, _, _ = render(settings, float(g["tan_fovx"]),
                           float(g["tan_fovy"]), 1.0, means, scales, rots,
                           opac, shs, j(g["view"]), j(g["proj"]),
                           j(g["campos"]), j(g["bg"]), None, jnp.int32(0))
        return img

    _, vjp = jax.vjp(f, j(g["pts"]), j(g["scales"]), j(g["rotations"]),
                     j(g["opacities"]), j(g["shs"]))
    dmean, dscale, drot, dopac, dsh = vjp(j(g["dl_dpix"]))

    # The high-opacity stress scene amplifies f32 rounding: with α near 0.99
    # the per-step transmittance factor (1-α) ~ 0.01, and the reference
    # reconstructs T by reverse division (backward.py:658) while gstpu runs a
    # forward-order prefix pass — algebraically identical, differently
    # rounded — plus a few keep-threshold flips (see the forward test).
    # Deviations measure ≤ 3e-3 of the max-gradient scale; cap at 5e-3.
    kw = (dict(atol=2e-4, outlier_frac=0.30, outlier_cap=5e-3)
          if case == "random_s1_64" else dict(atol=2e-4))
    _assert_close(np.asarray(dmean), g["d_mean3d"], "d_mean3d", **kw)
    _assert_close(np.asarray(dscale), g["d_scale"], "d_scale", **kw)
    _assert_close(np.asarray(drot), g["d_rot"], "d_rot", **kw)
    _assert_close(np.asarray(dopac), g["d_opacity"], "d_opacity", **kw)
    _assert_close(np.asarray(dsh),
                  g["d_shs"].reshape(np.shape(dsh)), "d_shs", **kw)

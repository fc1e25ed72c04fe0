"""User-facing render API mirroring the reference ``render_gaussians``.

The reference signature (forward.py:629-677) is kept where it makes sense;
everything is jitted under the hood.  Note the reference quirk: the ``colors``
argument is accepted but *never used* — colors always come from SH evaluation
(the kernels never receive it; forward.py:719-752).  We keep that behavior.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gstpu.config import RenderSettings
from gstpu.ops.rasterize import render


@functools.lru_cache(maxsize=32)
def _jitted(settings: RenderSettings, tan_fovx: float, tan_fovy: float,
            scale_modifier: float):
    return jax.jit(functools.partial(render, settings, tan_fovx, tan_fovy,
                                     scale_modifier))


def render_gaussians(background, means3D, colors=None, opacity=None,
                     scales=None, rotations=None, scale_modifier=1.0,
                     viewmatrix=None, projmatrix=None,
                     tan_fovx=0.5, tan_fovy=0.5,
                     image_height=256, image_width=256,
                     sh=None, degree=3, campos=None,
                     prefiltered=False, antialiasing=False, clamped=True,
                     debug=False, pair_capacity=None, use_pallas=False,
                     alive=None):
    """Render 3D Gaussians; returns (image (H,W,3), depth (H,W), aux).

    Functional analog of reference forward.py:629-894.  ``prefiltered`` /
    ``antialiasing`` are accepted-but-dead exactly as in the reference (Q3);
    ``colors`` is ignored (colors always evaluate from ``sh``); ``clamped``
    must be True (reference training always passes True).
    """
    del colors, prefiltered, antialiasing  # dead reference arguments (Q3)
    if not clamped:
        raise NotImplementedError("clamped=False is unused by the reference "
                                  "training path and is not supported")
    means3D = jnp.asarray(means3D, jnp.float32)
    n = means3D.shape[0]
    if pair_capacity is None:
        pair_capacity = max(1 << 12, int(2 ** np.ceil(np.log2(max(n * 24, 1)))))
    settings = RenderSettings(width=int(image_width), height=int(image_height),
                              sh_degree=int(degree),
                              pair_capacity=int(pair_capacity),
                              use_pallas=use_pallas)
    shs = jnp.asarray(sh, jnp.float32).reshape(n, -1, 3)
    if shs.shape[1] < 16:  # pad to the fixed 16-coefficient layout
        shs = jnp.pad(shs, ((0, 0), (0, 16 - shs.shape[1]), (0, 0)))
    opacity = jnp.asarray(opacity, jnp.float32).reshape(n)
    args = (means3D,
            jnp.asarray(scales, jnp.float32),
            jnp.asarray(rotations, jnp.float32),
            opacity,
            shs,
            jnp.asarray(viewmatrix, jnp.float32),
            jnp.asarray(projmatrix, jnp.float32),
            jnp.asarray(campos, jnp.float32),
            jnp.asarray(background, jnp.float32),
            alive,
            jnp.int32(0))
    while True:
        fn = _jitted(settings, float(tan_fovx), float(tan_fovy),
                     float(scale_modifier))
        image, depth, aux = fn(*args)
        num_pairs = int(aux.num_pairs)
        if num_pairs <= settings.pair_capacity:
            break
        # pair list overflowed (the analog of the reference's 2^30 guard,
        # forward.py:765-767): grow to the next power of two and re-render
        settings = dataclasses.replace(
            settings, pair_capacity=int(2 ** np.ceil(np.log2(num_pairs))))
    if debug:
        print(f"gstpu render: {image_width}x{image_height}, {n} gaussians, "
              f"pairs={num_pairs}/{settings.pair_capacity}")
    return image, depth, aux

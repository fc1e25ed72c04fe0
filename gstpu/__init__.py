"""gstpu — a TPU-native 3D Gaussian Splatting framework (JAX/XLA/Pallas/pjit).

A from-scratch reimplementation of the capabilities of ``zhujinchong/3DGS-native``
(a Warp/CUDA educational 3DGS renderer+trainer), redesigned TPU-first:

- differentiable tile-based rasterizer with a fully parallel (prefix-product)
  reformulation of front-to-back alpha compositing (``gstpu.ops.rasterize``),
- hand-written vectorized adjoint matching the reference's backward semantics
  (``gstpu.ops.preprocess_bwd``),
- Pallas TPU kernels for the hot rasterize paths (``gstpu.ops.pallas_rasterize``),
- fused Adam + densify/prune under fixed-capacity masked arrays (``gstpu.models``,
  ``gstpu.densify``),
- multi-chip sharding over a ``jax.sharding.Mesh`` with explicit collectives
  (``gstpu.parallel``).

Reference parity surface is documented per-function with ``file:line`` citations
into the reference repo.
"""

__version__ = "0.2.0"

from gstpu.config import GSConfig, RenderSettings  # noqa: F401
from gstpu.render import render_gaussians  # noqa: F401

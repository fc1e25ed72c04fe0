"""Minimal NumPy interpreter for the Warp API surface used by /root/reference.

Closes the round-1 "oracle loophole" (VERDICT: the parity oracle
``tests/oracle/ref_numpy.py`` was a builder-written transcription never
validated against running reference code): ``warp-lang`` cannot be installed
offline, but the reference's Warp kernels are plain-Python function bodies
under ``@wp.kernel`` decorators, so a small interpreter lets the reference's
OWN UNMODIFIED SOURCE (``/root/reference/forward.py``, ``backward.py``)
execute on CPU and produce goldens.  See ``tests/warp_shim/__init__.py`` for
the loader and ``scripts/gen_golden.py`` for the golden generation.

Semantics implemented (matching Warp where the reference exercises it):
- ``@wp.kernel`` / ``@wp.func`` are identity decorators; ``wp.launch`` runs
  the body serially over ``np.ndindex(dim)`` with ``wp.tid()`` returning the
  current thread index (scalar for 1-D launches, tuple otherwise);
- vec2/vec3/vec4/quaternion/mat33/mat44/VEC6 are ``np.ndarray`` subclasses
  where ``*`` follows Warp: ``mat*mat``/``mat*vec`` = matmul, ``vec*mat`` =
  row-vector times matrix, scalar = elementwise; ``vec*vec`` raises (Warp
  defines no componentwise ``*``; the reference uses explicit helpers);
- storage and vector math are float32; Python-float scalars stay "weak"
  (NumPy NEP 50), so mixed expressions compute in f32 like compiled Warp.
  Pure-Python scalar chains may still run in f64 — bit-exactness with
  compiled Warp is not a goal (f32-tolerance parity is);
- ``wp.int32``/``int()`` casts truncate toward zero (C semantics), matching
  the reference's truncation-vs-floor behavior in ``get_rect``
  (forward.py:69-74);
- ``float_bits_to_uint32`` (the reference's only native snippet,
  forward.py:51-57) is special-cased to an f32 bit reinterpretation, and
  ``wp.utils.radix_sort_pairs`` / ``array_scan`` to stable NumPy equivalents;
- ``wp.sign`` follows Warp (−1 for x<0, else +1 — NOT numpy's 0-at-0).
"""

from __future__ import annotations

import types as _pytypes

import numpy as np

# --------------------------------------------------------------------------
# vector / matrix types
# --------------------------------------------------------------------------


class _VecMat(np.ndarray):
    """Base for Warp's small fixed-size vec/mat values."""

    def __mul__(self, other):
        if isinstance(other, np.ndarray) and other.ndim >= 1:
            if self.ndim == 2 or other.ndim == 2:
                return np.matmul(np.asarray(self), np.asarray(other)).view(
                    _VecMat)
            raise TypeError(
                "Warp defines no componentwise vec*vec; use the wp_utils "
                "helpers (shim guard)")
        return (np.asarray(self) * other).view(type(self))

    def __rmul__(self, other):
        if isinstance(other, np.ndarray) and other.ndim >= 1:
            if self.ndim == 2 or other.ndim == 2:
                return np.matmul(np.asarray(other), np.asarray(self)).view(
                    _VecMat)
            raise TypeError("Warp defines no componentwise vec*vec (shim)")
        return (np.asarray(self) * other).view(type(self))


def _make_type(name: str, np_dtype, comp_shape):
    def __new__(cls, *args):
        n = int(np.prod(cls._comp_shape))
        if len(args) == 0:
            data = np.zeros(cls._comp_shape, cls._np_dtype)
        elif len(args) == 1:
            data = np.array(args[0], dtype=cls._np_dtype).reshape(
                cls._comp_shape).copy()
        else:
            if len(args) != n:
                raise TypeError(f"{name} expects {n} components")
            data = np.array(args, dtype=cls._np_dtype).reshape(
                cls._comp_shape)
        return data.view(cls)

    return type(name, (_VecMat,), {"_np_dtype": np_dtype,
                                   "_comp_shape": tuple(comp_shape),
                                   "__new__": __new__})


vec2 = _make_type("vec2", np.float32, (2,))
vec3 = _make_type("vec3", np.float32, (3,))
vec4 = _make_type("vec4", np.float32, (4,))
vec2i = _make_type("vec2i", np.int32, (2,))
vec2h = _make_type("vec2h", np.float16, (2,))
quaternion = _make_type("quaternion", np.float32, (4,))
mat33 = _make_type("mat33", np.float32, (3, 3))
mat44 = _make_type("mat44", np.float32, (4, 4))

float16 = np.float16
float32 = np.float32
int32 = np.int32
int64 = np.int64
uint32 = np.uint32


# Opt-in Q14 semantics for array.__getitem__ (see there).
oob_read_zero = False

# Opt-in Q16 semantics for array.__setitem__: drop out-of-bounds scalar
# writes silently, as bounds-checked (debug-mode) Warp does.  The reference
# sizes its densify/prune outputs from an EXCLUSIVE scan's last element
# (train.py:432-433, 496-497, 580-581, 640-641), which excludes the final
# array element's mask bit — so when that element is masked, the kernel's
# write for it lands one past the output (clone_gaussians /
# split_gaussians / compact_gaussians, optimizer.py) and is dropped (UB
# under release CUDA).  Effective semantics: the final element never
# clones/splits and is dropped by compaction when it survives pruning.
# Densify-parity harnesses enable this; golden generation keeps strict
# IndexError behavior so transcription bugs still surface.
oob_write_drop = False


def _resolve_dtype(dtype):
    """-> (np_dtype, comp_shape, comp_cls_or_None)."""
    if dtype is float or dtype is np.float32:
        return np.float32, (), None
    if dtype is int or dtype is np.int32:
        return np.int32, (), None
    if dtype is np.int64:
        return np.int64, (), None
    if dtype is np.uint32:
        return np.uint32, (), None
    if dtype is np.float16:
        return np.float16, (), None
    if isinstance(dtype, type) and issubclass(dtype, _VecMat):
        return dtype._np_dtype, dtype._comp_shape, dtype
    raise TypeError(f"unsupported warp dtype {dtype!r}")


# --------------------------------------------------------------------------
# arrays
# --------------------------------------------------------------------------


class array:
    """Warp device array: NumPy storage + logical (element) shape.

    ``wp.array(dtype=...)`` with no data (the kernel-annotation form) returns
    a hollow marker instance.
    """

    def __init__(self, data=None, dtype=float, device=None, shape=None,
                 ndim=None):
        self.wp_dtype = dtype
        np_dtype, comp, comp_cls = _resolve_dtype(dtype)
        self._comp = comp
        self._comp_cls = comp_cls
        if data is None and shape is None:
            self._data = None  # annotation marker
            return
        if data is None:
            full = (tuple(np.atleast_1d(shape)) if not isinstance(shape, int)
                    else (shape,)) + comp
            self._data = np.zeros(full, np_dtype)
            return
        arr = np.asarray(data)
        if comp and (arr.ndim == 0 or arr.shape[-len(comp):] != comp):
            raise ValueError(
                f"data shape {arr.shape} does not end with {comp}")
        self._data = np.ascontiguousarray(arr.astype(np_dtype, copy=True))

    @property
    def shape(self):
        nc = len(self._comp)
        return self._data.shape[:len(self._data.shape) - nc] if nc \
            else self._data.shape

    def __len__(self):
        return self.shape[0]

    def __getitem__(self, idx):
        if (oob_read_zero and isinstance(idx, (int, np.integer))
                and not -len(self._data) <= idx < len(self._data)):
            # Q14 (SURVEY §7.1): train.py:479-492 launches
            # mark_split_candidates over the POST-clone count while avg_grads
            # still has the pre-clone size — an out-of-bounds read (UB under
            # CUDA Warp).  This opt-in flag gives it the defined semantics
            # gstpu chose: OOB reads as zero, so fresh clones never split in
            # the same event.  Densify-parity harnesses enable it; golden
            # generation keeps strict IndexError behavior.
            v = np.zeros(self._comp, self._data.dtype)
            return v.view(self._comp_cls) if self._comp_cls is not None \
                else self._data.dtype.type(0)
        v = self._data[idx]
        if (self._comp_cls is not None and isinstance(v, np.ndarray)
                and v.shape == self._comp):
            return v.view(self._comp_cls)
        return v

    def __setitem__(self, idx, val):
        if (oob_write_drop and isinstance(idx, (int, np.integer))
                and not -len(self._data) <= idx < len(self._data)):
            return  # Q16: bounds-checked Warp drops OOB writes (see flag)
        self._data[idx] = np.asarray(val)

    def numpy(self):
        return self._data

    def zero_(self):
        self._data[...] = 0


def array2d(data=None, dtype=float, device=None, shape=None):
    return array(data=data, dtype=dtype, device=device, shape=shape)


def zeros(shape, dtype=float, device=None):
    return array(data=None, dtype=dtype, device=device,
                 shape=shape if not isinstance(shape, int) else (shape,))


def zeros_like(a: array):
    out = array(dtype=a.wp_dtype)
    out._data = np.zeros_like(a._data)
    out._comp, out._comp_cls = a._comp, a._comp_cls
    return out


def copy(dst: array, src: array, count=None):
    n = len(src._data) if count is None else int(count)
    dst._data[:n] = src._data[:n]


def to_torch(a: array):
    import torch
    return torch.from_numpy(a._data)


def from_torch(t, dtype=None):
    out = array(data=t.cpu().numpy(),
                dtype=dtype if dtype is not None else float)
    return out


# --------------------------------------------------------------------------
# kernels & launch
# --------------------------------------------------------------------------

_current_tid = 0


def kernel(fn):
    return fn


def func(fn):
    return fn


def func_native(snippet):
    """The reference's only native snippet is a float->uint32 bit cast
    (forward.py:51-57); interpret any func_native as exactly that."""

    def deco(fn):
        def float_bits_to_uint32(x):
            return np.array(x, np.float32).view(np.uint32)[()]
        return float_bits_to_uint32

    return deco


def launch(kernel, dim, inputs=(), device=None, **kw):
    global _current_tid
    dims = (int(dim),) if isinstance(dim, (int, np.integer)) else tuple(
        int(d) for d in dim)
    if len(dims) == 1:
        for i in range(dims[0]):
            _current_tid = i
            kernel(*inputs)
    else:
        for idx in np.ndindex(*dims):
            _current_tid = idx
            kernel(*inputs)


def tid():
    return _current_tid


# --------------------------------------------------------------------------
# math builtins
# --------------------------------------------------------------------------


def min(a, b):  # noqa: A001 - mirrors wp.min
    return np.minimum(a, b)


def max(a, b):  # noqa: A001
    return np.maximum(a, b)


def clamp(x, lo, hi):
    return np.clip(x, lo, hi)


def abs(x):  # noqa: A001
    return np.abs(x)


def sign(x):
    # Warp: -1 if x < 0 else +1 (unlike numpy's sign(0) == 0)
    return np.where(np.asarray(x) < 0, np.float32(-1.0), np.float32(1.0))[()]


def sqrt(x):
    return np.sqrt(x)


def exp(x):
    return np.exp(x)


def pow(x, y):  # noqa: A001
    return np.power(x, y)


def ceil(x):
    return np.ceil(x)


def floor(x):
    return np.floor(x)


def log(x):
    return np.log(x)


def dot(a, b):
    return np.float32(np.dot(np.asarray(a, np.float32),
                             np.asarray(b, np.float32)))


def length(v):
    return np.sqrt(dot(v, v))


def normalize(v):
    l = length(v)
    if l == 0.0:
        return v * 0.0
    return v / l


def transpose(m):
    return m.T


def determinant(m):
    return np.float32(np.linalg.det(np.asarray(m, np.float64)))


def quat_to_matrix(q):
    """Rotation matrix from quaternion (x, y, z, w) — Warp's convention."""
    x, y, z, w = (np.float32(q[i]) for i in range(4))
    return mat33(
        1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - z * w),
        2.0 * (x * z + y * w),
        2.0 * (x * y + z * w), 1.0 - 2.0 * (x * x + z * z),
        2.0 * (y * z - x * w),
        2.0 * (x * z - y * w), 2.0 * (y * z + x * w),
        1.0 - 2.0 * (x * x + y * y))


def atomic_add(arr, *args):
    *idx, val = args
    idx = tuple(idx)
    old = arr._data[idx].copy()
    arr._data[idx] = arr._data[idx] + np.asarray(val)
    return old


def randf(seed):
    """Deterministic uniform [0,1) from a uint32 seed.

    NOT bit-identical to Warp's PRNG (SURVEY Q11: noise magnitudes matter,
    bit parity does not); a splitmix-style integer hash keyed by the seed.
    """
    s = np.uint64(np.uint32(seed))
    s = (s + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = s
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = z ^ (z >> np.uint64(31))
    return np.float32(np.float64(z) / np.float64(2 ** 64))


def constant(x):
    return x


def init():
    return None


# --------------------------------------------------------------------------
# wp.utils / wp.types submodules
# --------------------------------------------------------------------------


def _radix_sort_pairs(keys: array, values: array, count):
    n = int(count)
    k = keys._data[:n].copy()
    order = np.argsort(k, kind="stable")
    keys._data[:n] = k[order]
    values._data[:n] = values._data[:n][order]


def _array_scan(in_arr: array, out_arr: array, inclusive=True):
    c = np.cumsum(in_arr._data, dtype=in_arr._data.dtype)
    if inclusive:
        out_arr._data[:] = c
    else:
        out_arr._data[0] = 0
        out_arr._data[1:] = c[:-1]


utils = _pytypes.SimpleNamespace(radix_sort_pairs=_radix_sort_pairs,
                                 array_scan=_array_scan)


def _vector(length, dtype):
    np_dtype, _, _ = _resolve_dtype(dtype)
    return _make_type(f"vec{length}", np_dtype, (length,))


types = _pytypes.SimpleNamespace(vector=_vector)

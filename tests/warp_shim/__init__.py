"""Loader that imports the reference (/root/reference) under the NumPy Warp
shim, so its unmodified kernels execute on CPU (see warpstub.py docstring).

The reference modules import bare names (``import warp``, ``from config
import *``, ``from utils.wp_utils import ...``); we register the shim as
``warp`` in sys.modules and put /root/reference on sys.path for the duration
of the import.  The loaded modules stay cached under their bare names
('config', 'forward', 'backward', 'utils', ...) — acceptable because neither
gstpu nor its tests use those top-level module names.
"""

from __future__ import annotations

import sys

REFERENCE_DIR = "/root/reference"


def load_reference():
    """Import and return (forward, backward) from the reference under the
    shim.  Idempotent."""
    fwd = sys.modules.get("forward")
    if fwd is not None and getattr(fwd, "__file__", "").startswith(
            REFERENCE_DIR):
        return fwd, sys.modules["backward"]

    from tests.warp_shim import warpstub
    sys.modules["warp"] = warpstub
    sys.modules["warp.utils"] = warpstub.utils
    sys.modules["warp.types"] = warpstub.types

    sys.path.insert(0, REFERENCE_DIR)
    try:
        import backward  # noqa: F401  (reference modules)
        import forward  # noqa: F401
    finally:
        sys.path.remove(REFERENCE_DIR)
    assert forward.__file__.startswith(REFERENCE_DIR)
    return forward, backward


def load_reference_module(name: str):
    """Import any other reference module (e.g. 'train', 'loss', 'optimizer')
    under the shim.  forward/backward are loaded first so shared state
    ('config', 'utils') resolves consistently."""
    import importlib

    load_reference()
    mod = sys.modules.get(name)
    if mod is not None and getattr(mod, "__file__", "").startswith(
            REFERENCE_DIR):
        return mod
    try:
        import plyfile  # noqa: F401  (not in this image)
    except ImportError:
        # the reference's point_cloud_utils imports plyfile at module level;
        # checkpoint PLYs are irrelevant to shim-driven comparisons, so a
        # no-op stub suffices.
        import types as _t

        stub = _t.ModuleType("plyfile")

        class _PlyElement:
            @staticmethod
            def describe(*a, **kw):
                return None

        class _PlyData:
            def __init__(self, *a, **kw):
                pass

            def write(self, *a, **kw):
                pass

        stub.PlyElement = _PlyElement
        stub.PlyData = _PlyData
        sys.modules["plyfile"] = stub
    sys.path.insert(0, REFERENCE_DIR)
    try:
        mod = importlib.import_module(name)
    finally:
        sys.path.remove(REFERENCE_DIR)
    assert mod.__file__.startswith(REFERENCE_DIR)
    return mod

"""PLY checkpoint export/import in the 3DGS-standard vertex schema.

Write-side matches the reference field layout exactly for viewer interop
(utils/point_cloud_utils.py:72-89): x,y,z, scale_0..2, opacity,
rot_{x,y,z,w}, red/green/blue (DC-derived u8), f_dc_0..2, f_rest_0..44.
Unlike the reference's per-point Python loop (point_cloud_utils.py:36-69),
this is fully vectorized NumPy (+ a self-contained binary PLY writer/reader —
no ``plyfile`` dependency).  A load path (absent from the reference; SURVEY §5
checkpoint row) is provided for resume and for rendering external point clouds.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

_DTYPE_MAP = {"f4": ("float", np.float32), "u1": ("uchar", np.uint8)}
_INV_TYPE = {"float": np.float32, "float32": np.float32,
             "uchar": np.uint8, "uint8": np.uint8,
             "double": np.float64, "int": np.int32, "uint": np.uint32,
             "short": np.int16, "ushort": np.uint16, "char": np.int8}


def _vertex_dtype() -> np.dtype:
    fields = [("x", "f4"), ("y", "f4"), ("z", "f4"),
              ("scale_0", "f4"), ("scale_1", "f4"), ("scale_2", "f4"),
              ("opacity", "f4"),
              ("rot_x", "f4"), ("rot_y", "f4"), ("rot_z", "f4"), ("rot_w", "f4"),
              ("red", "u1"), ("green", "u1"), ("blue", "u1"),
              ("f_dc_0", "f4"), ("f_dc_1", "f4"), ("f_dc_2", "f4")]
    fields += [(f"f_rest_{i}", "f4") for i in range(45)]
    return np.dtype(fields)


def save_ply(params: Dict[str, np.ndarray], filepath, num_points: int,
             colors: np.ndarray | None = None,
             parameterization: str | None = None) -> None:
    """Write a binary-little-endian 3DGS PLY (point_cloud_utils.py:10-100).

    Values are written as STORED — under ``parameterization="activated"``
    scales are log-space and opacities logits (the official 3DGS on-disk
    convention); under ``"raw"`` they are render-space (the reference's
    convention, Q2).  The parameterization is recorded as a header comment so
    ``load_ply`` can round-trip it; foreign PLYs without the comment are
    classified by ``detect_parameterization``.
    """
    pos = np.asarray(params["positions"])[:num_points]
    scales = np.asarray(params["scales"])[:num_points]
    rots = np.asarray(params["rotations"])[:num_points]
    opac = np.asarray(params["opacities"])[:num_points]
    shs = np.asarray(params["shs"]).reshape(-1, 16, 3)[:num_points]

    if colors is None:
        colors = np.clip(shs[:, 0] + 0.5, 0.0, 1.0)
    col255 = np.clip(np.asarray(colors) * 255, 0, 255).astype(np.uint8)

    v = np.zeros(num_points, dtype=_vertex_dtype())
    v["x"], v["y"], v["z"] = pos.T
    v["scale_0"], v["scale_1"], v["scale_2"] = scales.T
    v["opacity"] = opac
    v["rot_x"], v["rot_y"], v["rot_z"], v["rot_w"] = rots.T
    v["red"], v["green"], v["blue"] = col255.T
    v["f_dc_0"], v["f_dc_1"], v["f_dc_2"] = shs[:, 0].T
    rest = shs[:, 1:].reshape(num_points, 45)  # 15 coeffs x 3 channels
    for i in range(45):
        v[f"f_rest_{i}"] = rest[:, i]

    header = ["ply", "format binary_little_endian 1.0"]
    if parameterization is not None:
        header.append(f"comment gstpu parameterization={parameterization}")
    header.append(f"element vertex {num_points}")
    for name, fmt in _vertex_dtype().descr:
        header.append(f"property {_DTYPE_MAP[fmt.lstrip('<|')][0]} {name}")
    header.append("end_header")

    filepath = str(filepath)
    os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
    with open(filepath, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(v.tobytes())


def load_ply(filepath) -> Dict[str, np.ndarray]:
    """Read a 3DGS PLY back into a parameter dict (new capability).

    The returned dict carries ``"parameterization"`` ("raw" / "activated")
    when the file records it in a header comment; use
    ``render_space_params`` to get render-space values either way.
    """
    parameterization = None
    with open(filepath, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError("not a PLY file")
        fmt = f.readline().strip()
        if b"binary_little_endian" not in fmt:
            raise ValueError(f"unsupported PLY format: {fmt!r}")
        n = None
        props = []
        while True:
            line = f.readline().strip().decode("ascii")
            if line == "end_header":
                break
            parts = line.split()
            if parts[0] == "element" and parts[1] == "vertex":
                n = int(parts[2])
            elif parts[0] == "property":
                props.append((parts[2], _INV_TYPE[parts[1]]))
            elif (parts[0] == "comment" and len(parts) >= 3
                  and parts[1] == "gstpu"
                  and parts[2].startswith("parameterization=")):
                parameterization = parts[2].split("=", 1)[1]
        dtype = np.dtype([(name, t) for name, t in props])
        v = np.frombuffer(f.read(dtype.itemsize * n), dtype=dtype, count=n)

    names = v.dtype.names
    positions = np.stack([v["x"], v["y"], v["z"]], -1).astype(np.float32)
    scales = np.stack([v[f"scale_{i}"] for i in range(3)], -1).astype(np.float32)
    if "rot_x" in names:  # our / reference layout
        rots = np.stack([v["rot_x"], v["rot_y"], v["rot_z"], v["rot_w"]], -1)
    else:  # official 3DGS uses rot_0..3 in (w, x, y, z)
        wxyz = np.stack([v[f"rot_{i}"] for i in range(4)], -1)
        rots = np.concatenate([wxyz[:, 1:], wxyz[:, :1]], -1)
    opac = np.asarray(v["opacity"], np.float32)
    n_rest = sum(1 for name in names if name.startswith("f_rest_"))
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = np.stack([v[f"f_dc_{i}"] for i in range(3)], -1)
    if n_rest:
        rest = np.stack([v[f"f_rest_{i}"] for i in range(n_rest)], -1)
        shs[:, 1:1 + n_rest // 3] = rest.reshape(n, -1, 3)
    out = {"positions": positions, "scales": scales,
           "rotations": rots.astype(np.float32), "opacities": opac,
           "shs": shs}
    if parameterization is not None:
        out["parameterization"] = parameterization
    return out


def detect_parameterization(params: Dict[str, np.ndarray]) -> str:
    """Classify a loaded PLY as "raw" or "activated" stored values.

    Raw (reference Q2): opacities clamped to [0, 1], scales floored at
    0.001 — always positive.  Activated (official 3DGS on-disk convention):
    opacities are logits (trained values stray outside [0, 1]) and scales are
    logs (trained scales ≪ 1 ⇒ negative).  A trained checkpoint is therefore
    unambiguous; a perfectly in-range activated file would be misread, but
    such values (all logits in [0,1] AND all log-scales > 0) do not occur in
    practice.
    """
    if "parameterization" in params:
        return str(params["parameterization"])
    opac = np.asarray(params["opacities"])
    scales = np.asarray(params["scales"])
    if (opac.size and (opac.min() < 0.0 or opac.max() > 1.0)) or \
            (scales.size and scales.min() <= 0.0):
        return "activated"
    return "raw"


def render_space_params(params: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Map loaded PLY params to render-space (apply exp/sigmoid if needed)."""
    if detect_parameterization(params) == "activated":
        params = {**params,
                  "scales": np.exp(params["scales"]),
                  "opacities": 1.0 / (1.0 + np.exp(-params["opacities"]))}
    return {k: v for k, v in params.items() if k != "parameterization"}

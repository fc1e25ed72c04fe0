"""Cameras and projection math.

Replicates the reference camera semantics exactly (they define the parity
surface of every rendered pixel):

- OpenGL/Blender camera-to-world axes are flipped to COLMAP convention via
  ``c2w[:3, 1:3] *= -1`` (reference utils/camera_utils.py:14-15).
- View and projection matrices are stored **transposed** (row-vector
  convention): points transform as ``p_view = [p, 1] @ view`` —
  camera_utils.py:26-27, and the warp kernels' ``vec4 * mat44``.
- ``full_proj = world_to_camera_T @ proj_T`` (camera_utils.py:47-48).
- The projection matrix is the z_sign=+1, z in [0, 1] OpenGL-style matrix of
  utils/math_utils.py:21-41.
"""

from __future__ import annotations

import json
import math
import os
from typing import Any, Dict, List, Tuple

import numpy as np
from flax import struct


@struct.dataclass
class Camera:
    """One camera, ready to feed the renderer.

    ``view`` and ``proj`` are the *transposed* (row-vector convention)
    world-to-camera and full projection matrices, matching the reference's
    storage (camera_utils.py:27,47-48).  ``width``/``height`` are static so a
    Camera can be a jit argument.
    """

    view: Any          # (4, 4) f32, transposed world-to-camera
    proj: Any          # (4, 4) f32, transposed full projection (w2c @ P^T)
    campos: Any        # (3,) f32 camera center in world space
    tan_fovx: float = struct.field(pytree_node=False, default=0.5)
    tan_fovy: float = struct.field(pytree_node=False, default=0.5)
    width: int = struct.field(pytree_node=False, default=256)
    height: int = struct.field(pytree_node=False, default=256)


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate: np.ndarray | None = None,
                  scale: float = 1.0) -> np.ndarray:
    """Build a world-to-view matrix from rotation+translation.

    Mirrors reference utils/math_utils.py:8-19 (note: it stores ``R.T`` in the
    rotation block; the reference passes the world-to-camera rotation here and
    relies on downstream transposition conventions).
    """
    if translate is None:
        translate = np.zeros(3)
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = np.asarray(R).T
    Rt[:3, 3] = np.asarray(t)
    Rt[3, 3] = 1.0
    c2w = np.linalg.inv(Rt)
    cam_center = (c2w[:3, 3] + translate) * scale
    c2w[:3, 3] = cam_center
    return np.linalg.inv(c2w).astype(np.float32)


def projection_matrix(fovx: float, fovy: float, znear: float, zfar: float) -> np.ndarray:
    """OpenGL-style projection with z_sign=+1 and z mapped to [0, 1].

    Mirrors reference utils/math_utils.py:21-41.
    """
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4))
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def load_camera(camera_info: Dict[str, Any],
                znear: float = 0.01, zfar: float = 100.0) -> Dict[str, Any]:
    """Load one camera from a NeRF-style dict (reference camera_utils.py:8-91).

    Returns a dict with the same keys the reference training loop consumes
    (``world_to_camera``, ``full_proj_matrix``, ``camera_center``,
    ``tan_fovx/y``, ``width``, ``height``) plus a ready ``Camera``.
    """
    c2w = np.asarray(camera_info["camera_to_world"], dtype=np.float64).copy()
    # OpenGL/Blender (Y up, Z back) -> COLMAP (Y down, Z forward).
    c2w[:3, 1:3] *= -1
    w2c = np.linalg.inv(c2w).astype(np.float32)
    R = w2c[:3, :3]
    T = w2c[:3, 3]
    w2c[3, 3] = 1.0
    w2c_T = w2c.T.copy()

    width = camera_info["width"]
    height = camera_info["height"]
    focal = camera_info["focal"]
    fovx = 2 * np.arctan(width / (2 * focal))
    fovy = 2 * np.arctan(height / (2 * focal))

    proj_T = projection_matrix(fovx=fovx, fovy=fovy, znear=znear, zfar=zfar).T
    full_proj = (w2c_T @ proj_T).astype(np.float32)
    tan_fovx = float(np.tan(fovx * 0.5))
    tan_fovy = float(np.tan(fovy * 0.5))
    camera_center = np.linalg.inv(w2c_T)[3, :3].astype(np.float32)

    cam = Camera(
        view=w2c_T.astype(np.float32),
        proj=full_proj,
        campos=camera_center,
        tan_fovx=tan_fovx,
        tan_fovy=tan_fovy,
        width=int(width),
        height=int(height),
    )
    return {
        "R": R,
        "T": T,
        "camera_center": camera_center,
        "world_to_camera": w2c_T.astype(np.float32),
        "full_proj_matrix": full_proj,
        "tan_fovx": tan_fovx,
        "tan_fovy": tan_fovy,
        "width": int(width),
        "height": int(height),
        "camera": cam,
        # Parsed-but-unapplied in the reference too (camera_utils.py:57-68):
        # the rasterizer is pinhole-only; these are carried for API parity.
        "camera_type": camera_info.get("camera_type", "perspective"),
        "distortion_params": camera_info.get("distortion_params",
                                             [0.0, 0.0, 0.0, 0.0]),
    }


def load_camera_from_json(json_path: str, camera_id: int = 0,
                          znear: float = 0.01, zfar: float = 100.0):
    """Load a single camera from a transforms-style JSON file
    (reference camera_utils.py:93-113)."""
    with open(json_path) as f:
        transforms = json.load(f)
    frame = transforms["frames"][camera_id]
    width = transforms.get("w") or transforms.get("width") or 800
    height = transforms.get("h") or transforms.get("height") or 800
    focal = 0.5 * width / np.tan(0.5 * transforms["camera_angle_x"])
    info = {"camera_id": camera_id,
            "camera_to_world": frame["transform_matrix"],
            "width": width, "height": height, "focal": focal,
            "camera_type": frame.get("camera_type", "perspective"),
            "distortion_params": frame.get("distortion_params",
                                           [0.0, 0.0, 0.0, 0.0])}
    return load_camera(info, znear=znear, zfar=zfar)


def save_cameras_json(cameras: List[Dict[str, Any]], path,
                      image_names: List[str] | None = None) -> None:
    """Write the official 3DGS viewer ``cameras.json`` (one entry per
    camera: id, img_name, width, height, position, rotation (camera-to-
    world 3x3), fx, fy).  Together with the exact-schema PLY export this
    makes a training output directory loadable by standard 3DGS viewers.
    (The reference defines only a dead JSON *loader* with its own schema,
    camera_utils.py:93-113.)"""
    entries = []
    for i, cam in enumerate(cameras):
        R_w2c = np.asarray(cam["R"], np.float64)
        name = image_names[i] if image_names else f"{i:05d}"
        entries.append({
            "id": i,
            "img_name": os.path.splitext(os.path.basename(name))[0],
            "width": int(cam["width"]),
            "height": int(cam["height"]),
            "position": [float(x) for x in cam["camera_center"]],
            "rotation": [[float(x) for x in row] for row in R_w2c.T],
            "fx": float(cam["width"] / (2.0 * cam["tan_fovx"])),
            "fy": float(cam["height"] / (2.0 * cam["tan_fovy"])),
        })
    with open(path, "w") as f:
        json.dump(entries, f)


def load_nerf_cameras(dataset_path: str, split: str,
                      downscale: int = 1) -> Tuple[List[Dict[str, Any]], List[str]]:
    """Parse ``transforms_{split}.json`` (reference train.py:265-321).

    ``downscale`` divides the rendered resolution (official 3DGS ``-r``):
    width/height and the pixel focal shrink together, so the field of view
    is unchanged."""
    import imageio.v2 as imageio

    transforms_path = os.path.join(dataset_path, f"transforms_{split}.json")
    with open(transforms_path) as f:
        transforms = json.load(f)

    first = transforms["frames"][0]
    first_img = os.path.join(dataset_path, first["file_path"] + ".png")
    img = imageio.imread(first_img)
    height, width = img.shape[0] // downscale, img.shape[1] // downscale
    focal = 0.5 * width / np.tan(0.5 * transforms["camera_angle_x"])

    cameras, image_paths = [], []
    for i, frame in enumerate(transforms["frames"]):
        info = {
            "camera_id": i,
            "camera_to_world": frame["transform_matrix"],
            "width": width,
            "height": height,
            "focal": focal,
        }
        cameras.append(load_camera(info))
        image_paths.append(os.path.join(dataset_path, frame["file_path"] + ".png"))
    return cameras, image_paths

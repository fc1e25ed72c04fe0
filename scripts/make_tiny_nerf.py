#!/usr/bin/env python
"""Generate a tiny synthetic NeRF dataset (transforms_{train,val}.json + PNGs).

Cameras orbit the origin looking inward (NeRF-synthetic / Blender convention:
OpenGL c2w, reference camera_utils.py:8-39); images are simple renderable
content (a bright centered blob) so a few training steps visibly reduce loss.
Used by the verify workflow and the trainer smoke test.
"""

import argparse
import json
from pathlib import Path

import numpy as np


def look_at_c2w(eye: np.ndarray) -> np.ndarray:
    """OpenGL/Blender camera-to-world looking from ``eye`` at the origin."""
    fwd = -eye / np.linalg.norm(eye)           # camera looks along -Z
    world_up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, world_up)
    if np.linalg.norm(right) < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = up
    c2w[:3, 2] = -fwd
    c2w[:3, 3] = eye
    return c2w


def make_dataset(out_dir: Path, size: int = 64, n_train: int = 4,
                 n_val: int = 2, radius: float = 4.0) -> None:
    import imageio.v2 as imageio

    out_dir.mkdir(parents=True, exist_ok=True)
    camera_angle_x = 0.6911112070083618  # Lego's fov

    yy, xx = np.meshgrid(np.linspace(-1, 1, size), np.linspace(-1, 1, size),
                         indexing="ij")
    r2 = xx * xx + yy * yy

    for split, n in (("train", n_train), ("val", n_val)):
        frames = []
        img_dir = out_dir / split
        img_dir.mkdir(exist_ok=True)
        for i in range(n):
            theta = 2 * np.pi * (i + (0.5 if split == "val" else 0.0)) / n
            eye = radius * np.array([np.cos(theta), np.sin(theta), 0.35])
            c2w = look_at_c2w(eye)
            # a soft centered blob, hue varying slowly with the angle
            base = np.exp(-4.0 * r2)
            img = np.stack([base * (0.6 + 0.4 * np.cos(theta)),
                            base * 0.5,
                            base * (0.6 + 0.4 * np.sin(theta))], axis=-1)
            rgba = np.concatenate(
                [np.clip(img, 0, 1), np.ones((size, size, 1))], axis=-1)
            name = f"r_{i}"
            imageio.imwrite(img_dir / f"{name}.png",
                            (rgba * 255).astype(np.uint8))
            # normalized inverse-depth target (NeRF-synthetic naming,
            # cf. reference data/lego/test r_N_depth_0001.png): the blob
            # sits at the origin ~radius away, so inv depth ~ 1/radius where
            # there is content, 0 (masked out) elsewhere
            depth = np.where(base > 0.05, 1.0 / radius, 0.0)
            imageio.imwrite(img_dir / f"{name}_depth_0001.png",
                            (depth * 255).astype(np.uint8))
            frames.append({"file_path": f"./{split}/{name}",
                           "transform_matrix": c2w.tolist()})
        with open(out_dir / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="/tmp/tiny_nerf")
    ap.add_argument("--size", type=int, default=64)
    args = ap.parse_args()
    make_dataset(Path(args.out), size=args.size)
    print(f"wrote tiny NeRF dataset to {args.out}")

"""Assemble a training-progress animation from a run's per-checkpoint
renders — the analog of the reference's committed
``assets/example_train_lego.gif`` (reference readme.md:19).

The Trainer writes ``render_<iteration>.png`` at every save interval
(gstpu/trainer.py _save_debug_images); this collects them in iteration
order into one GIF, with the iteration number stamped as a simple
pixel-block counter (no font dependencies).

Usage: python -m scripts.make_train_gif --run <output_dir> \
           [--out train_progress.gif] [--fps 4] [--max-size 400]
"""

from __future__ import annotations

import argparse
import re
from pathlib import Path

import numpy as np

# 3x5 bitmap digits for the iteration stamp
_DIGITS = {
    "0": "111101101101111", "1": "010110010010111", "2": "111001111100111",
    "3": "111001111001111", "4": "101101111001001", "5": "111100111001111",
    "6": "111100111101111", "7": "111001001001001", "8": "111101111101111",
    "9": "111101111001111",
}


def _stamp(frame: np.ndarray, text: str, scale: int = 3) -> np.ndarray:
    """Stamp ``text`` (digits only) white-on-dark at the top-left corner."""
    h, w = 5 * scale, 4 * scale * len(text)
    pad = 2 * scale
    frame[:h + 2 * pad, :w + 2 * pad] = frame[:h + 2 * pad, :w + 2 * pad] // 3
    for ci, ch in enumerate(text):
        bits = _DIGITS.get(ch)
        if bits is None:
            continue
        for i in range(5):
            for j in range(3):
                if bits[i * 3 + j] == "1":
                    y = pad + i * scale
                    x = pad + ci * 4 * scale + j * scale
                    frame[y:y + scale, x:x + scale] = 255
    return frame


def main():
    import imageio.v2 as imageio

    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True, help="training output directory")
    ap.add_argument("--out", default="train_progress.gif")
    ap.add_argument("--fps", type=float, default=4.0)
    ap.add_argument("--max-size", type=int, default=400,
                    help="downscale frames to at most this many pixels/side")
    args = ap.parse_args()

    frames = []
    for p in sorted(Path(args.run).glob("render_*.png")):
        m = re.match(r"render_(\d+)\.png", p.name)
        if not m:
            continue
        frames.append((int(m.group(1)), p))
    if not frames:
        raise SystemExit(f"no render_*.png frames under {args.run}")
    frames.sort()

    images = []
    for iteration, p in frames:
        img = imageio.imread(p)
        step = max(1, max(img.shape[:2]) // args.max_size)
        img = np.ascontiguousarray(img[::step, ::step])
        images.append(_stamp(img, str(iteration)))
    # hold the final frame a few extra ticks
    images.extend([images[-1]] * 3)
    imageio.mimsave(args.out, images, duration=1.0 / args.fps, loop=0)
    print(f"wrote {args.out}: {len(frames)} checkpoints "
          f"({frames[0][0]}..{frames[-1][0]})")


if __name__ == "__main__":
    main()

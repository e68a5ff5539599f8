"""Square-crop real-world captures around their cloth masks.

Counterpart of /root/reference/scripts/bimanual_real/create_crops_w_mask.py:
given per-category dirs of rgb/, mask/, raw_depth/ captures, computes the
mask bounding box + margin, makes it square (clipped to the image), and
writes cropped_rgb/, cropped_mask/, cropped_raw_depth/ in the layout
bifold_tpu.data.RealDataset reads. Mask creation itself (the reference's
Segment-Anything point-prompt script) is upstream — any binary PNG mask
works; scripts/README.md documents a depth-threshold fallback.

Usage: python scripts/bimanual_real_crops.py --root <bimanual_real> [--margin 40]
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np
from PIL import Image


def square_bbox(mask: np.ndarray, margin: int):
    ys, xs = np.nonzero(mask > 0)
    if len(xs) == 0:
        return 0, 0, mask.shape[1], mask.shape[0]
    x0, x1 = xs.min() - margin, xs.max() + margin
    y0, y1 = ys.min() - margin, ys.max() + margin
    side = max(x1 - x0, y1 - y0)
    cx, cy = (x0 + x1) // 2, (y0 + y1) // 2
    half = side // 2
    h, w = mask.shape
    x0 = int(np.clip(cx - half, 0, w - side))
    y0 = int(np.clip(cy - half, 0, h - side))
    return x0, y0, min(side, w), min(side, h)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--margin", type=int, default=40)
    args = ap.parse_args()

    root = Path(args.root)
    for category in sorted(os.listdir(root)):
        cdir = root / category
        if not (cdir / "mask").is_dir():
            continue
        for sub in ("cropped_rgb", "cropped_mask", "cropped_raw_depth"):
            (cdir / sub).mkdir(exist_ok=True)
        for mask_file in sorted((cdir / "mask").glob("*.png")):
            mask = np.array(Image.open(mask_file))
            if mask.ndim == 3:
                mask = mask[:, :, 0]
            x0, y0, w, h = square_bbox(mask, args.margin)
            stem = mask_file.stem

            rgb = np.array(Image.open(cdir / "rgb" / f"{stem}.png"))
            Image.fromarray(rgb[y0:y0 + h, x0:x0 + w]).save(
                cdir / "cropped_rgb" / f"{stem}.png")
            m3 = np.stack([mask] * 3, axis=-1)
            Image.fromarray(m3[y0:y0 + h, x0:x0 + w].astype(np.uint8)).save(
                cdir / "cropped_mask" / f"{stem}.png")
            depth = np.load(cdir / "raw_depth" / f"{stem}.npy")
            np.save(cdir / "cropped_raw_depth" / f"{stem}.npy",
                    depth[y0:y0 + h, x0:x0 + w])
            print(f"[crops] {category}/{stem}: {w}x{h} @ ({x0},{y0})")


if __name__ == "__main__":
    main()

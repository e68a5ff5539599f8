"""Create cloth masks for real-world captures.

Counterpart of /root/reference/scripts/bimanual_real/create_masks.py, which
prompts Segment-Anything with hand-picked points per cloth/instruction. SAM
is not available in this environment, so this script supports two backends:

- ``--backend sam``: uses segment_anything if importable (point prompts from
  a JSON file mapping capture stem -> [[x, y], ...]);
- ``--backend depth`` (default): thresholds the raw depth against the table
  plane (median of the border pixels) — adequate for top-down captures of
  cloth on a uniform surface.

Writes mask/<stem>.png next to rgb/ and raw_depth/, ready for
scripts/bimanual_real_crops.py.
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np
from PIL import Image


def depth_mask(depth: np.ndarray, margin: float = 0.015) -> np.ndarray:
    border = np.concatenate([depth[0], depth[-1], depth[:, 0], depth[:, -1]])
    table = np.median(border[border > 0])
    mask = (depth > 0) & (depth < table - margin)
    return (mask * 255).astype(np.uint8)


def sam_mask(rgb: np.ndarray, points, checkpoint: str) -> np.ndarray:
    from segment_anything import SamPredictor, sam_model_registry  # noqa: WPS433
    sam = sam_model_registry["default"](checkpoint=checkpoint)
    predictor = SamPredictor(sam)
    predictor.set_image(rgb)
    masks, scores, _ = predictor.predict(
        point_coords=np.asarray(points, np.float32),
        point_labels=np.ones(len(points), np.int32))
    return (masks[np.argmax(scores)] * 255).astype(np.uint8)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--backend", choices=["depth", "sam"], default="depth")
    ap.add_argument("--prompts", help="JSON: stem -> [[x, y], ...] (sam backend)")
    ap.add_argument("--sam-checkpoint")
    ap.add_argument("--depth-margin", type=float, default=0.015,
                    help="meters above which a pixel counts as cloth")
    args = ap.parse_args()

    prompts = json.loads(Path(args.prompts).read_text()) if args.prompts else {}
    root = Path(args.root)
    n = 0
    for category in sorted(os.listdir(root)):
        cdir = root / category
        if not (cdir / "raw_depth").is_dir():
            continue
        (cdir / "mask").mkdir(exist_ok=True)
        for depth_file in sorted((cdir / "raw_depth").glob("*.npy")):
            stem = depth_file.stem
            if args.backend == "sam":
                rgb = np.array(Image.open(cdir / "rgb" / f"{stem}.png"))
                pts = prompts.get(stem)
                if not pts:
                    print(f"[masks] no prompt for {stem}; skipping")
                    continue
                mask = sam_mask(rgb, pts, args.sam_checkpoint)
            else:
                depth = np.load(depth_file).astype(np.float32)
                if depth.max() > 100:  # millimeters -> meters
                    depth = depth / 1000.0
                mask = depth_mask(depth, args.depth_margin)
            Image.fromarray(mask).save(cdir / "mask" / f"{stem}.png")
            n += 1
    print(f"[masks] wrote {n} masks")


if __name__ == "__main__":
    main()

"""Click-to-annotate bimanual actions on real cropped captures.

Script replacement for the reference's notebook workflow
(/root/reference/scripts/bimanual_real/annotate_actions.ipynb): walk a
bimanual-real dataset tree (``<category>/cropped_rgb`` etc., skipping the
``empty`` category), show each capture group's first frame, and record clicks
in the order **left pick, left place, right pick, right place** (repeat for
additional manipulations on the same frame). Rows are written as the
``(N, 8)`` npy schema ``[lp_x, lp_y, lpl_x, lpl_y, rp_x, rp_y, rpl_x, rpl_y]``
to ``<category>/cropped_annotations/<prefix>.npy`` — exactly what
``bifold_tpu.data.real_dataset.RealDataset`` consumes.

Like the notebook, a row is only accepted when both pick points land on the
cloth mask (``cropped_mask``). Unlike the notebook, appending to an existing
file deduplicates row-wise (the notebook's ``np.unique`` on a 2-D array
flattens it, corrupting the file on update — annotate_actions.ipynb cell 6).

Usage:
    python scripts/annotate_actions.py --dataset /path/to/bimanual_real \
        [--category towel] [--overwrite]

Keys while annotating: left-click to add a point, right-click to undo the
last point, Enter/middle-click to finish the image, closing the window skips.
A viz overlay per annotation is saved under ``<category>/cropped_viz``.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

POINTS_PER_ROW = 4  # left pick, left place, right pick, right place


def find_image_groups(dataset_path: str | Path,
                      category: Optional[str] = None) -> List[Tuple[str, str, str]]:
    """(category, prefix, first-frame path) per capture group, sorted.

    Groups ``cropped_rgb/<prefix>_<exposure>.png`` files by prefix and picks
    the first frame of each group — the notebook's listing cell verbatim
    semantics (annotate_actions.ipynb cell 2).
    """
    dataset_path = Path(dataset_path)
    cats = [category] if category else sorted(
        c for c in os.listdir(dataset_path)
        if c != "empty" and (dataset_path / c / "cropped_rgb").is_dir())
    out = []
    for cat in cats:
        rgb_dir = dataset_path / cat / "cropped_rgb"
        groups: Dict[str, List[str]] = {}
        for f in sorted(os.listdir(rgb_dir)):
            if not f.endswith(".png"):
                continue
            *prefix, _ = os.path.splitext(f)[0].split("_")
            groups.setdefault("_".join(prefix), []).append(f)
        for prefix, files in sorted(groups.items()):
            out.append((cat, prefix, str(rgb_dir / sorted(files)[0])))
    return out


def load_mask(dataset_path: str | Path, category: str, frame_name: str) -> np.ndarray:
    """Boolean cloth mask for a frame (first channel > 127)."""
    p = Path(dataset_path) / category / "cropped_mask" / frame_name
    arr = np.asarray(Image.open(p))
    if arr.ndim == 3:
        arr = arr[:, :, 0]
    return arr > 127


def rows_from_clicks(clicks: List[Tuple[float, float]],
                     mask: np.ndarray) -> np.ndarray:
    """(N, 8) annotation rows from a flat click list.

    Clicks come in chunks of 4 (left pick/place, right pick/place); a chunk
    is dropped (with a warning) when either pick is off-mask — the notebook's
    validity rule (cell 6: ``mask[from_left[1], from_left[0]] and ...``).
    A trailing partial chunk (stray clicks before Enter) is dropped with a
    warning rather than aborting a long annotation session.
    """
    if len(clicks) % POINTS_PER_ROW:
        keep = len(clicks) - len(clicks) % POINTS_PER_ROW
        print(f"  [skip] {len(clicks) - keep} stray click(s) at the end "
              f"(need multiples of {POINTS_PER_ROW}: left pick, left place, "
              "right pick, right place)")
        clicks = clicks[:keep]
    rows = []
    h, w = mask.shape
    for i in range(0, len(clicks), POINTS_PER_ROW):
        chunk = clicks[i:i + POINTS_PER_ROW]
        picks_ok = True
        for x, y in (chunk[0], chunk[2]):
            xi, yi = int(round(x)), int(round(y))
            if not (0 <= yi < h and 0 <= xi < w and mask[yi, xi]):
                picks_ok = False
        if not picks_ok:
            print(f"  [skip] row {i // POINTS_PER_ROW}: pick point off mask")
            continue
        rows.append(np.asarray(chunk, np.float64).reshape(-1))
    return (np.stack(rows) if rows
            else np.zeros((0, 2 * POINTS_PER_ROW), np.float64))


def save_annotation(path: str | Path, rows: np.ndarray,
                    overwrite: bool = False) -> np.ndarray:
    """Merge ``rows`` into the npy at ``path`` (row-wise unique) and save.

    Returns the saved array. Deliberate fix over the notebook: its update
    path ran ``np.unique`` WITHOUT ``axis=0``, flattening the (N, 8) array to
    sorted scalars and destroying the file's schema.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if path.exists() and not overwrite:
        saved = np.load(path)
        if saved.ndim == 1:
            saved = saved[None, :]
        rows = np.concatenate([saved, rows], axis=0) if rows.size else saved
    if rows.size:
        rows = np.unique(rows, axis=0)
    np.save(path, rows)
    return rows


def render_annotation(rgb: np.ndarray, rows: np.ndarray) -> np.ndarray:
    """Overlay picks (discs) and pick->place segments per arm — left red,
    right green, matching the notebook's visualize_gt colors."""
    img = np.array(rgb, np.uint8, copy=True)
    h, w = img.shape[:2]
    colors = {"left": (255, 0, 0), "right": (0, 255, 0)}
    for row in np.atleast_2d(rows):
        for arm, off in (("left", 0), ("right", 4)):
            pick, place = row[off:off + 2], row[off + 2:off + 4]
            if pick[0] < 0:
                continue
            _disc(img, pick, colors[arm], radius=3)
            _segment(img, pick, place, colors[arm])
    return img[:h, :w]


def _disc(img, center, color, radius=3):
    h, w = img.shape[:2]
    cx, cy = center
    ys, xs = np.ogrid[:h, :w]
    ring = np.abs((xs - cx) ** 2 + (ys - cy) ** 2 - radius**2) <= radius * 2
    img[ring] = color


def _segment(img, p0, p1, color):
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]))) + 1
    ts = np.linspace(0.0, 1.0, 2 * n + 1)
    xs = np.clip(np.round(p0[0] + ts * (p1[0] - p0[0])), 0, img.shape[1] - 1)
    ys = np.clip(np.round(p0[1] + ts * (p1[1] - p0[1])), 0, img.shape[0] - 1)
    img[ys.astype(int), xs.astype(int)] = color


def annotate_image(image_path: str) -> List[Tuple[float, float]]:
    """Interactive click collection with matplotlib (blocking)."""
    import matplotlib.pyplot as plt

    img = np.asarray(Image.open(image_path))
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(img)
    ax.set_title(f"{Path(image_path).name}\n"
                 "click: L-pick, L-place, R-pick, R-place (repeat); "
                 "right-click undo; Enter done")
    pts = plt.ginput(n=-1, timeout=0, show_clicks=True,
                     mouse_add=1, mouse_pop=3, mouse_stop=2)
    plt.close(fig)
    return [(float(x), float(y)) for x, y in pts]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--category", default=None)
    ap.add_argument("--overwrite", action="store_true",
                    help="replace existing annotation files instead of merging")
    ap.add_argument("--start", type=int, default=0,
                    help="index into the image list to resume from")
    args = ap.parse_args()

    images = find_image_groups(args.dataset, args.category)
    print(f"[annotate] {len(images)} capture groups")
    for i, (cat, prefix, img_path) in enumerate(images[args.start:],
                                                start=args.start):
        print(f"[{i}/{len(images)}] {cat}/{prefix}")
        clicks = annotate_image(img_path)
        if not clicks:
            print("  no clicks; skipped")
            continue
        mask = load_mask(args.dataset, cat, Path(img_path).name)
        rows = rows_from_clicks(clicks, mask)
        if not rows.size:
            print("  no valid rows; skipped")
            continue
        out = Path(args.dataset) / cat / "cropped_annotations" / f"{prefix}.npy"
        saved = save_annotation(out, rows, overwrite=args.overwrite)
        print(f"  wrote {out} ({len(saved)} rows)")
        viz = render_annotation(np.asarray(Image.open(img_path)), saved)
        viz_path = Path(args.dataset) / cat / "cropped_viz" / f"{prefix}.png"
        viz_path.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(viz).save(viz_path)


if __name__ == "__main__":
    main()

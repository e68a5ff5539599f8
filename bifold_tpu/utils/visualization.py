"""Prediction visualization: heatmap overlays, action arrows, rollout dumps.

Counterpart of /root/reference/bifold/utils/visualization.py: per-key
subfolders of rgb / colormapped+alpha-blended heatmaps / GT-vs-pred arrow
overlays (GT red/green circles+arrows, predictions blue/cyan) / particle
positions. Arrays in, files out — device arrays are converted up front.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import cv2
import numpy as np
from PIL import Image

from bifold_tpu.env.action import Action

__all__ = ["save_predictions", "visualize_action"]


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _colormap(val: np.ndarray, colormap: str) -> np.ndarray:
    import matplotlib.pyplot as plt
    cm = plt.get_cmap(colormap)
    v = np.clip(_np(val).squeeze(), 0.0, 1.0)
    return (cm(v)[:, :, :3] * 255).astype(np.uint8)


def save_predictions(out_folder: str, out_file_name: str, rgb=None,
                     colormap: str = "viridis", **kwargs) -> None:
    """Save each named artifact into its own subfolder
    (reference visualization.py:10-46)."""
    rgb_img: Optional[Image.Image] = None
    if rgb is not None:
        folder = os.path.join(out_folder, "rgb")
        os.makedirs(folder, exist_ok=True)
        rgb_img = Image.fromarray(_np(rgb).astype(np.uint8))
        rgb_img.save(os.path.join(folder, out_file_name))

    for k, val in kwargs.items():
        if val is None:
            continue
        folder = os.path.join(out_folder, k)
        os.makedirs(folder, exist_ok=True)
        if "heatmap" in k or k == "depth":
            arr = _np(val).squeeze()
            if arr.ndim <= 1:
                continue
            if k == "depth":
                rng = arr.max() - arr.min()
                arr = (arr - arr.min()) / (rng if rng > 0 else 1.0)
            heatmap = Image.fromarray(_colormap(arr, colormap))
            if rgb_img is not None and "heatmap" in k:
                Image.blend(rgb_img, heatmap, alpha=0.3).save(
                    os.path.join(folder, out_file_name))
            else:
                heatmap.save(os.path.join(folder, out_file_name))
        elif k == "particle_pos":
            np.save(os.path.join(folder, out_file_name.replace(".png", ".npy")),
                    _np(val))
        elif k in ("viz", "rgb_gt"):
            Image.fromarray(_np(val).astype(np.uint8)).save(
                os.path.join(folder, out_file_name))
        else:
            raise ValueError(f"Unrecognized argument {k}")


def _pick_place_viz(img: np.ndarray, picks, places, color) -> np.ndarray:
    picks = _np(picks).reshape(-1, 2)
    places = _np(places).reshape(-1, 2)
    for pick, place in zip(picks, places):
        if pick[0] >= 0:
            cv2.circle(img, (round(float(pick[0])), round(float(pick[1]))),
                       radius=3, color=color, thickness=2)
        if place[0] >= 0:
            cv2.arrowedLine(img,
                            (round(float(pick[0])), round(float(pick[1]))),
                            (round(float(place[0])), round(float(place[1]))),
                            color=color, thickness=2)
    return img


def visualize_action(sample: Dict, action: Action) -> List[np.ndarray]:
    """GT (red/green) vs predicted (blue/cyan) pick->place arrows over raw_rgb
    (reference visualization.py:49-106)."""
    gt_colors = [(255, 0, 0), (0, 255, 0)]
    pred_colors = [(0, 0, 255), (0, 255, 255)]
    raw = _np(sample["raw_rgb"])
    batched = raw.ndim == 4
    frames = raw if batched else raw[None]

    images = []
    for i, img in enumerate(frames):
        img = np.ascontiguousarray(img.astype(np.uint8))

        def get(key):
            if key not in sample:
                return None
            v = _np(sample[key])
            return v[i] if batched and v.ndim >= 2 and len(v) == len(frames) else v

        if not action.is_bimanual:
            gt_pick, gt_place = get("pick"), get("place")
            if gt_pick is not None and gt_place is not None:
                img = _pick_place_viz(img, gt_pick, gt_place, gt_colors[0])
            img = _pick_place_viz(img, _np(action.pick).reshape(-1, 2)[i],
                                  _np(action.place).reshape(-1, 2)[i],
                                  pred_colors[0])
        else:
            for arm, gt_c, pred_c in zip(("left", "right"), gt_colors, pred_colors):
                gt_pick, gt_place = get(f"{arm}_pick"), get(f"{arm}_place")
                if gt_pick is not None and gt_place is not None:
                    img = _pick_place_viz(img, gt_pick, gt_place, gt_c)
                img = _pick_place_viz(
                    img,
                    _np(getattr(action, f"{arm}_pick")).reshape(-1, 2)[i],
                    _np(getattr(action, f"{arm}_place")).reshape(-1, 2)[i],
                    pred_c)
        images.append(img)
    return images

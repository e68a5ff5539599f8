"""Repackage language_deformable raw demos into the sequential episodes pkl.

Counterpart of /root/reference/scripts/create_unimanual_sequential_dataset.py:
walks <root>/<task>/<traj>/ directories, reads info.pkl (pick/place/
instruction/primitive/unseen_flags) plus per-step depth/ (and rgb/) PNGs,
keeps seen-task steps, and pickles {"episodes": [...]} in the format
bifold_tpu.data.SingleDatasetSequential consumes.

Usage: python scripts/create_unimanual_sequential_dataset.py \
    --root <demos> --tasks All --save_path All_100.pkl --n_demos 100 [--use_rgb]
"""

from __future__ import annotations

import argparse
import os
import pickle
import random

import imageio.v2 as imageio


def create_dataset(root: str, tasks, save_path: str, use_rgb: bool,
                   n_demos: int, seed: int = 0) -> None:
    random.seed(seed)
    if "All" in tasks:
        tasks = os.listdir(root)
        print("Load All Tasks:", tasks)
    trajs = [os.path.join(root, task, traj)
             for task in tasks
             for traj in os.listdir(os.path.join(root, task))]
    random.shuffle(trajs)

    episodes = []
    per_task = {task: 0 for task in tasks}
    total = seen = 0
    for traj in trajs:
        task = traj.split(os.path.sep)[-2]
        if per_task[task] >= n_demos:
            continue
        with open(os.path.join(traj, "info.pkl"), "rb") as f:
            info = pickle.load(f)
        n = len(info["pick"])
        total += n
        per_task[task] += 1

        ep = {"depth": [], "pick": [], "place": [], "instruction": [],
              "success": [], "primitive": []}
        if use_rgb:
            ep["rgbs"] = []
        for i in range(n):
            if info["unseen_flags"][i]:
                continue  # train only on seen-task steps
            seen += 1
            ep["pick"].append(info["pick"][i])
            ep["place"].append(info["place"][i])
            ep["instruction"].append(info["instruction"][i])
            ep["primitive"].append(info["primitive"][i])
            ep["success"].append(0)
            ep["depth"].append(imageio.imread(
                os.path.join(traj, "depth", f"{i}.png")))
            if use_rgb:
                ep["rgbs"].append(imageio.imread(
                    os.path.join(traj, "rgb", f"{i}.png")))
        if ep["depth"]:
            episodes.append(ep)

    print(f"Kept {seen} seen steps of {total} total; per task: {per_task}")
    with open(save_path, "wb") as f:
        pickle.dump({"episodes": episodes}, f)
    print(f"Wrote {save_path} ({len(episodes)} episodes)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--tasks", nargs="+", default=["All"])
    ap.add_argument("--save_path", required=True)
    ap.add_argument("--use_rgb", action="store_true")
    ap.add_argument("--n_demos", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    create_dataset(args.root, args.tasks, args.save_path, args.use_rgb,
                   args.n_demos, args.seed)

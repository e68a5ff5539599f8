"""Render vr-folding frames into the dataset's renders/ layout.

Replacement for the reference's BlenderProc pipeline
(/root/reference/scripts/rendering/{render.py, render_view_blenderproc.py,
run_all_renders_actions.py}) using this repo's own rasterizer (C++ core when
built): for each action frame (+ temporal context neighbors at the zarr step
of 5 frames), renders colors/depth PNGs from a randomized camera view and
writes camera_matrix/<prefix>.npy + intrinsics.npy — exactly the files
bifold_tpu.data.bimanual_dataset consumes. Vertex occlusion is tested by
z-buffer comparison instead of Blender ray casts.

Usage: python scripts/render_views.py --dataset <folding_root> \
    [--image-size 384] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np
from PIL import Image

from bifold_tpu.data.zarr_lite import open_group
from bifold_tpu.env.sim import ClothSim
from bifold_tpu.ops.geometry import intrinsic_from_fov


def look_at_matrix(cam_pos: np.ndarray, target: np.ndarray) -> np.ndarray:
    """World->camera with +z forward (the projection convention of
    bifold_tpu.env.sim) looking from cam_pos toward target."""
    fwd = target - cam_pos
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])
    if abs(fwd @ up) > 0.99:
        up = np.array([1.0, 0.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    rot = np.stack([right, down, fwd])  # rows: camera x (right), y (down), z (fwd)
    m = np.eye(4)
    m[:3, :3] = rot
    m[:3, 3] = -rot @ cam_pos
    return m


def render_frame(verts: np.ndarray, faces: np.ndarray, w2c: np.ndarray,
                 image_size: int, uvs=None, texture=None):
    sim = ClothSim()
    sim.set_cloth(verts, faces, dedup=False)
    sim.camera_params = dict(sim.camera_params)
    if uvs is not None and texture is not None:
        sim.uvs, sim.texture = uvs, texture
    # bypass the angle-based camera: rasterize with the explicit matrix
    sim._camera_matrix = lambda: w2c  # type: ignore[method-assign]
    rgba, depth = sim.render(image_size, image_size)
    return rgba[:, :, :3], depth


def load_frame_uvs(obj_path: Path, n_verts: int):
    """Per-vertex UVs from a create_textured_objs output .obj: obj vt rows
    are indexed per face corner; the corner-to-vertex assignment (last write
    wins) matches the rasterizer's per-vertex sampling."""
    from create_textured_objs import read_obj_with_uv

    _, uvs, faces, face_uvs, _ = read_obj_with_uv(obj_path)
    per_vertex = np.zeros((n_verts, 2), np.float32)
    for f, fu in zip(faces, face_uvs):
        for vi, ui in zip(f, fu):
            if vi < n_verts and ui < len(uvs):
                per_vertex[vi] = uvs[ui]
    return per_vertex


def visible_vertices(verts: np.ndarray, depth: np.ndarray, w2c: np.ndarray,
                     k: np.ndarray, tol: float = 5e-3) -> np.ndarray:
    """Vertex visibility via z-buffer compare (reference uses Blender ray
    casts, render_view_blenderproc.py:18-60)."""
    hom = np.concatenate([verts, np.ones((len(verts), 1))], axis=1)
    cam = (w2c @ hom.T).T[:, :3]
    z = cam[:, 2]
    h, w = depth.shape
    u = np.clip((cam[:, 0] * k[0, 0] / np.maximum(z, 1e-9) + k[0, 2]).astype(int), 0, w - 1)
    v = np.clip((cam[:, 1] * k[1, 1] / np.maximum(z, 1e-9) + k[1, 2]).astype(int), 0, h - 1)
    return (z > 0) & (np.abs(depth[v, u] - z) < tol)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", required=True,
                    help="folding root containing vr_folding_dataset.zarr + actions/")
    ap.add_argument("--image-size", type=int, default=384)
    ap.add_argument("--frame-step", type=int, default=5,
                    help="temporal neighbor stride (reference zarr step)")
    ap.add_argument("--n-context", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cam-distance", type=float, default=1.5)
    ap.add_argument("--textured-objs", default=None,
                    help="dir of create_textured_objs outputs (<frame>.obj); "
                         "when a frame has one, its UVs drive texture "
                         "sampling in the rasterizer")
    ap.add_argument("--texture-image", default=None,
                    help="texture image sampled via the .obj UVs")
    args = ap.parse_args()

    texture = None
    if args.texture_image:
        texture = (np.asarray(Image.open(args.texture_image).convert("RGB"),
                              np.float32) / 255.0)

    rng = np.random.default_rng(args.seed)
    root = Path(args.dataset)
    zroot = root / "vr_folding_dataset.zarr"
    s = args.image_size
    k3 = intrinsic_from_fov(s, s, fov=45)[:3, :3]

    for category in sorted(p.name for p in zroot.iterdir() if p.is_dir()):
        out = root / "renders" / category
        for sub in ("colors", "depth", "camera_matrix"):
            (out / sub).mkdir(parents=True, exist_ok=True)
        np.save(out / "intrinsics.npy", k3)

        samples = open_group(zroot / category)["samples"]
        by_prefix: dict = {}
        for frame in samples.keys():
            prefix = "_".join(frame.split("_")[:-1])
            by_prefix.setdefault(prefix, []).append(frame)

        for prefix, frames in by_prefix.items():
            # one randomized view per capture sequence (the reference renders
            # every frame of a sequence from the same sampled camera)
            theta = rng.uniform(0, 2 * np.pi)
            elev = rng.uniform(np.pi / 4, np.pi / 2.2)
            cam_pos = args.cam_distance * np.array([
                np.cos(theta) * np.cos(elev), np.sin(elev),
                np.sin(theta) * np.cos(elev)])
            w2c = look_at_matrix(cam_pos, np.zeros(3))
            intr = np.eye(4)
            intr[:3, :3] = k3
            np.save(out / "camera_matrix" / f"{prefix}.npy", intr @ w2c)

            for frame in sorted(frames):
                mesh = samples[frame]["mesh"]
                verts = np.asarray(mesh["cloth_verts"])
                faces = np.asarray(mesh["cloth_faces_tri"])
                uvs = None
                if args.textured_objs and texture is not None:
                    obj_path = Path(args.textured_objs) / f"{frame}.obj"
                    if obj_path.exists():
                        uvs = load_frame_uvs(obj_path, len(verts))
                rgb, depth = render_frame(verts, faces, w2c, s,
                                          uvs=uvs, texture=texture)
                Image.fromarray(rgb).save(out / "colors" / f"{frame}.png")
                depth_mm = np.clip(depth * 1000, 0, 65535).astype(np.uint16)
                Image.fromarray(depth_mm).save(out / "depth" / f"{frame}.png")
            print(f"[render_views] {category}/{prefix}: {len(frames)} frames")


if __name__ == "__main__":
    main()

"""Build textured .obj files for vr-folding frames.

Counterpart of /root/reference/scripts/rendering/create_textured_objs.py:
for each zarr frame, transplant the texture coordinates of the garment's
CLOTH3D source mesh onto the tracked mesh by nearest-neighbor vertex matching
in NOCS space (cKDTree), and write an .obj with vt/f entries referencing the
donor material. Pure numpy/scipy — no trimesh.

Usage: python scripts/create_textured_objs.py --dataset <folding_root> \
    --cloth3d <dir with textured source objs> --out <obj output dir>
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from scipy.spatial import cKDTree

from bifold_tpu.data.zarr_lite import open_group


def read_obj_with_uv(path: Path):
    verts, uvs, faces, face_uvs = [], [], [], []
    mtllib = None
    for line in path.read_text().splitlines():
        if line.startswith("mtllib"):
            mtllib = line.split()[1]
        elif line.startswith("v "):
            verts.append([float(x) for x in line.split()[1:4]])
        elif line.startswith("vt "):
            uvs.append([float(x) for x in line.split()[1:3]])
        elif line.startswith("f "):
            vi, ti = [], []
            for tok in line.split()[1:]:
                parts = tok.split("/")
                vi.append(int(parts[0]) - 1)
                ti.append(int(parts[1]) - 1 if len(parts) > 1 and parts[1] else 0)
            for k in range(1, len(vi) - 1):
                faces.append([vi[0], vi[k], vi[k + 1]])
                face_uvs.append([ti[0], ti[k], ti[k + 1]])
    return (np.asarray(verts, np.float32), np.asarray(uvs, np.float32),
            np.asarray(faces, np.int64), np.asarray(face_uvs, np.int64), mtllib)


def write_obj(path: Path, verts, uvs, faces, face_uvs, mtllib=None) -> None:
    lines = []
    if mtllib:
        lines.append(f"mtllib {mtllib}")
    lines += [f"v {x:.6f} {y:.6f} {z:.6f}" for x, y, z in verts]
    lines += [f"vt {u:.6f} {v:.6f}" for u, v in uvs]
    for f, fu in zip(faces, face_uvs):
        lines.append("f " + " ".join(f"{v + 1}/{t + 1}" for v, t in zip(f, fu)))
    path.write_text("\n".join(lines) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--cloth3d", required=True,
                    help="directory of textured donor objs named <instance>.obj")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    zroot = Path(args.dataset) / "vr_folding_dataset.zarr"
    donors = {p.stem: p for p in Path(args.cloth3d).glob("*.obj")}

    count = 0
    for category in sorted(p.name for p in zroot.iterdir() if p.is_dir()):
        samples = open_group(zroot / category)["samples"]
        for frame in samples.keys():
            instance = "_".join(frame.split("_")[:-1])
            donor_path = donors.get(instance) or donors.get(frame)
            if donor_path is None:
                continue
            d_verts, d_uvs, _d_faces, d_face_uvs, mtllib = read_obj_with_uv(donor_path)
            mesh = samples[frame]["mesh"]
            verts = np.asarray(mesh["cloth_verts"])
            nocs = np.asarray(mesh["cloth_nocs_verts"])
            faces = np.asarray(mesh["cloth_faces_tri"])
            # match tracked vertices to donor vertices (the donor is the
            # canonical rest mesh, so NOCS coordinates align)
            idx = cKDTree(d_verts).query(nocs)[1]
            # per-face UV indices follow the matched vertices; donor uv index
            # of a matched vertex = first face-uv referencing it
            vert_uv = np.zeros(len(d_verts), np.int64)
            for f, fu in zip(_d_faces, d_face_uvs):
                vert_uv[f] = fu
            face_uvs = vert_uv[idx][faces]
            write_obj(out / f"{frame}.obj", verts, d_uvs, faces, face_uvs, mtllib)
            count += 1
    print(f"[create_textured_objs] wrote {count} objs to {out}")


if __name__ == "__main__":
    main()

"""Offline tooling smokes: the rendering replacement renders a fabricated
zarr dataset into the renders/ layout the bimanual datasets consume, and the
crop tool produces RealDataset-shaped outputs."""

import sys

import numpy as np
import pytest
from PIL import Image


def test_render_views_pipeline(tmp_path, monkeypatch):
    sys.path.insert(0, "tests")
    from test_bimanual_data import write_zarr_array, write_zarr_group

    root = tmp_path / "folding"
    zroot = root / "vr_folding_dataset.zarr"
    write_zarr_group(zroot)
    write_zarr_group(zroot / "Tshirt")
    samples = zroot / "Tshirt" / "samples"
    write_zarr_group(samples)
    base = np.array([[-0.3, 0.0, -0.3], [0.3, 0.0, -0.3],
                     [-0.3, 0.0, 0.3], [0.3, 0.0, 0.3]], np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int64)
    for t in range(2):
        g = samples / f"00001_Tshirt_000000_{t:06d}"
        write_zarr_group(g, attrs={"instance_id": "i", "garment_name": "Tshirt",
                                   "sample_id": t})
        write_zarr_group(g / "mesh")
        write_zarr_array(g / "mesh" / "cloth_verts", base + 0.01 * t)
        write_zarr_array(g / "mesh" / "cloth_nocs_verts", base)
        write_zarr_array(g / "mesh" / "cloth_faces_tri", faces)

    monkeypatch.setattr(sys, "argv", ["render_views", "--dataset", str(root),
                                      "--image-size", "96", "--seed", "0"])
    sys.path.insert(0, "scripts")
    import render_views
    render_views.main()

    renders = root / "renders" / "Tshirt"
    assert (renders / "intrinsics.npy").exists()
    assert (renders / "camera_matrix" / "00001_Tshirt_000000.npy").exists()
    depth = np.array(Image.open(
        renders / "depth" / "00001_Tshirt_000000_000000.png"))
    rgb = np.array(Image.open(
        renders / "colors" / "00001_Tshirt_000000_000000.png"))
    assert depth.shape == (96, 96) and rgb.shape == (96, 96, 3)
    # the cloth is visible: some depth below the far plane
    assert (depth < 1900).sum() > 20, depth.min()

    # visibility check helper agrees with the rendered depth
    from bifold_tpu.data.zarr_lite import open_group
    k = np.load(renders / "intrinsics.npy")
    cam = np.load(renders / "camera_matrix" / "00001_Tshirt_000000.npy")
    intr = np.eye(4)
    intr[:3, :3] = k
    w2c = np.linalg.inv(intr) @ cam
    verts = np.asarray(open_group(zroot / "Tshirt")["samples"]
                       ["00001_Tshirt_000000_000000"]["mesh"]["cloth_verts"])
    vis = render_views.visible_vertices(verts, depth / 1000.0, w2c, k, tol=0.05)
    assert vis.any()


def test_crop_tool(tmp_path):
    sys.path.insert(0, "scripts")
    import bimanual_real_crops as crops

    cdir = tmp_path / "towel"
    for sub in ("rgb", "mask", "raw_depth"):
        (cdir / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    mask = np.zeros((120, 160), np.uint8)
    mask[40:80, 60:110] = 255
    Image.fromarray(rgb).save(cdir / "rgb" / "05_towel_0_0.png")
    Image.fromarray(mask).save(cdir / "mask" / "05_towel_0_0.png")
    np.save(cdir / "raw_depth" / "05_towel_0_0.npy",
            rng.random((120, 160)).astype(np.float32))

    sys.argv = ["crops", "--root", str(tmp_path), "--margin", "10"]
    crops.main()
    out = np.array(Image.open(cdir / "cropped_rgb" / "05_towel_0_0.png"))
    assert out.shape[0] == out.shape[1]  # square
    d = np.load(cdir / "cropped_raw_depth" / "05_towel_0_0.npy")
    assert d.shape == out.shape[:2]

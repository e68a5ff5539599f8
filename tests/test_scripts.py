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

    # textured re-render: a create_textured_objs-style .obj + texture image
    # drive UV sampling in the rasterizer (same layout, different colors)
    tex_path = tmp_path / "tex.png"
    tex = np.zeros((8, 8, 3), np.uint8)
    tex[:, :4] = (255, 0, 0)
    tex[:, 4:] = (0, 0, 255)
    Image.fromarray(tex).save(tex_path)
    objs = tmp_path / "objs"
    objs.mkdir()
    obj_lines = ["v -0.3 0.0 -0.3", "v 0.3 0.0 -0.3",
                 "v -0.3 0.0 0.3", "v 0.3 0.0 0.3",
                 "vt 0.1 0.5", "vt 0.9 0.5", "vt 0.1 0.5", "vt 0.9 0.5",
                 "f 1/1 2/2 3/3", "f 2/2 4/4 3/3"]
    (objs / "00001_Tshirt_000000_000000.obj").write_text(
        "\n".join(obj_lines) + "\n")
    monkeypatch.setattr(sys, "argv", [
        "render_views", "--dataset", str(root), "--image-size", "96",
        "--seed", "0", "--textured-objs", str(objs),
        "--texture-image", str(tex_path)])
    render_views.main()
    rgb_tex = np.array(Image.open(
        renders / "colors" / "00001_Tshirt_000000_000000.png"))
    cloth = depth < 1900
    px = rgb_tex[cloth].astype(int)
    # both texture tones land on the cloth, and the frame changed
    assert (px[:, 0] > px[:, 2]).any() and (px[:, 2] > px[:, 0]).any()
    assert not np.array_equal(rgb_tex, rgb)


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


def test_annotate_actions_roundtrip(tmp_path):
    """Headless annotation flow: synthesized clicks -> (N, 8) npy -> consumed
    by RealDataset (replaces the reference's annotate_actions.ipynb)."""
    root = tmp_path / "bimanual_real"
    cat = root / "towel"
    for sub in ("cropped_raw_depth", "cropped_rgb", "cropped_mask"):
        (cat / sub).mkdir(parents=True)
    (root / "empty").mkdir()
    size = 48
    rng = np.random.default_rng(0)
    for exposure in range(2):
        stem = f"05_towel_0_{exposure}"
        np.save(cat / "cropped_raw_depth" / f"{stem}.npy",
                np.full((size, size), 800.0, np.float32))
        Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
                        ).save(cat / "cropped_rgb" / f"{stem}.png")
        m = np.zeros((size, size, 3), np.uint8)
        m[10:40, 10:40] = 255
        Image.fromarray(m).save(cat / "cropped_mask" / f"{stem}.png")

    sys.path.insert(0, "scripts")
    import annotate_actions as aa

    groups = aa.find_image_groups(root)
    assert groups == [("towel", "05_towel_0",
                       str(cat / "cropped_rgb" / "05_towel_0_0.png"))]
    mask = aa.load_mask(root, "towel", "05_towel_0_0.png")
    assert mask[12, 12] and not mask[0, 0]

    # two manipulations; the second has an off-mask pick and is dropped
    clicks = [(12.0, 14.0), (30.0, 32.0), (20.0, 22.0), (38.0, 36.0),
              (2.0, 2.0), (30.0, 30.0), (20.0, 20.0), (30.0, 30.0)]
    rows = aa.rows_from_clicks(clicks, mask)
    assert rows.shape == (1, 8)
    np.testing.assert_allclose(rows[0], [12, 14, 30, 32, 20, 22, 38, 36])

    out = cat / "cropped_annotations" / "05_towel_0.npy"
    aa.save_annotation(out, rows)
    # merging the same rows again deduplicates (notebook's np.unique-without-
    # axis update path corrupted the schema; ours must not)
    merged = aa.save_annotation(out, rows)
    assert merged.shape == (1, 8)
    extra = rows + np.array([[1, 0, 0, 0, 1, 0, 0, 0]], np.float64)
    merged = aa.save_annotation(out, extra)
    assert merged.shape == (2, 8)

    viz = aa.render_annotation(
        np.asarray(Image.open(groups[0][2])), merged)
    assert viz.shape == (size, size, 3) and (viz != 0).any()

    # stray trailing clicks are dropped with a warning, not a session abort
    assert aa.rows_from_clicks(clicks[:3], mask).size == 0
    assert len(aa.rows_from_clicks(clicks[:5], mask)) == len(
        aa.rows_from_clicks(clicks[:4], mask))

    from bifold_tpu.data.real_dataset import RealDataset

    cfg = {"name": "real", "dataset_path": str(root), "depth_scale": 1000,
           "is_bimanual": True, "voxel_size": 0.0125, "neighbor_radius": 0.045,
           "num_nodes": 20, "max_context_length": 3, "image_size": size}
    proc_cfg = {"model_image_size": size, "text_encoder": None, "sigma": 5,
                "requires_graph": False, "spatial_augment": False,
                "strategy": "gmm", "mask_depth": True, "standardize_depth": False}
    ds = RealDataset(cfg, processor_config=proc_cfg, partition="test")
    raw = ds[0]
    assert raw["left_pick"].shape == (8, 2)
    picks = {tuple(p) for p in raw["left_pick"][raw["left_pick"][:, 0] >= 0]}
    assert (12.0, 14.0) in picks or (13.0, 14.0) in picks

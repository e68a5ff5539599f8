"""Bimanual data stack on a fabricated miniature vr-folding dataset:
zarr_lite reading, vertex->pixel projection labels, sequential context,
action mining, partition building, and the real dataset's template sets."""

import json
import os
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from bifold_tpu.data.zarr_lite import Group, open_group

IMAGE = 64
CATEGORY = "Tshirt"
PREFIX = f"00001_{CATEGORY}_000000"


def write_zarr_array(path: Path, arr: np.ndarray):
    path.mkdir(parents=True, exist_ok=True)
    arr = np.ascontiguousarray(arr)
    meta = {
        "zarr_format": 2, "shape": list(arr.shape), "chunks": list(arr.shape),
        "dtype": arr.dtype.str, "compressor": None, "fill_value": 0,
        "order": "C", "filters": None,
    }
    (path / ".zarray").write_text(json.dumps(meta))
    chunk_name = ".".join(["0"] * max(arr.ndim, 1))
    (path / chunk_name).write_bytes(arr.tobytes())


def write_zarr_group(path: Path, attrs=None):
    path.mkdir(parents=True, exist_ok=True)
    (path / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    if attrs:
        (path / ".zattrs").write_text(json.dumps(attrs))


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    """12-frame instance: both arms grasp frames 2..8, cloth translates."""
    root = tmp_path_factory.mktemp("folding")
    zroot = root / "vr_folding_dataset.zarr"
    write_zarr_group(zroot)
    cat = zroot / CATEGORY
    write_zarr_group(cat)
    samples = cat / "samples"
    write_zarr_group(samples)

    # flat quad cloth at z=2 in front of an identity camera
    base = np.array([[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0],
                     [-0.5, 0.5, 2.0], [0.5, 0.5, 2.0]], np.float32)
    nocs = np.array([[1, 0, 1], [0, 0, 1], [1, 0, 0], [0, 0, 0]], np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int64)

    frames = []
    for t in range(12):
        frame = f"{PREFIX}_{t:06d}"
        frames.append(frame)
        g = samples / frame
        write_zarr_group(g, attrs={"instance_id": "00001_Tshirt_000000",
                                   "garment_name": "Tshirt",
                                   "sample_id": t})
        mesh = g / "mesh"
        write_zarr_group(mesh)
        verts = base.copy()
        if 2 <= t <= 8:  # grasped: vertex 0 moves right substantially
            verts[0, 0] += 0.12 * (t - 2)
        write_zarr_array(mesh / "cloth_verts", verts)
        write_zarr_array(mesh / "cloth_nocs_verts", nocs)
        write_zarr_array(mesh / "cloth_faces_tri", faces)
        grips = g / "grip_vertex_id"
        write_zarr_group(grips)
        on = 2 <= t <= 8
        write_zarr_array(grips / "left_grip_vertex_id",
                         np.array([0 if on else -1], np.int64))
        write_zarr_array(grips / "right_grip_vertex_id",
                         np.array([1 if on else -1], np.int64))

    # renders: identity extrinsics, fx=fy=64 cx=cy=32
    renders = root / "renders" / CATEGORY
    (renders / "depth").mkdir(parents=True)
    (renders / "colors").mkdir()
    (renders / "camera_matrix").mkdir()
    k = np.array([[64.0, 0, 32], [0, 64.0, 32], [0, 0, 1]])
    np.save(renders / "intrinsics.npy", k)
    intr = np.eye(4)
    intr[:3, :3] = k
    np.save(renders / "camera_matrix" / f"{PREFIX}.npy", intr @ np.eye(4))
    rng = np.random.default_rng(0)
    for frame in frames:
        depth_mm = np.full((IMAGE, IMAGE), 3000, np.int32)  # background 3 m
        depth_mm[16:48, 16:48] = 2000  # cloth plane at 2 m
        Image.fromarray(depth_mm.astype(np.int32), mode="I").save(
            renders / "depth" / f"{frame}.png")
        rgb = rng.integers(0, 255, (IMAGE, IMAGE, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(renders / "colors" / f"{frame}.png")

    # actions CSVs (start frame 2, end frame 8)
    row = {
        "left_start_idx": f"{PREFIX}_000002", "left_grip_from": "[0]",
        "left_grip_to": "[0]", "left_end_idx": f"{PREFIX}_000008",
        "right_start_idx": f"{PREFIX}_000002", "right_grip_from": "[1]",
        "right_grip_to": "[1]", "right_end_idx": f"{PREFIX}_000008",
        "text": "Fold the tshirt in half from left to right.",
    }
    for sub, extra in (("actions", {}),
                       ("sequential_actions",
                        {"context": f"['{PREFIX}_000000', '{PREFIX}_000001']"})):
        d = root / sub
        d.mkdir()
        df = pd.DataFrame([dict(row, **extra)] * 3)
        df.to_csv(d / "train.csv")
        df.to_csv(d / "test.csv")
    return root


PROC_CFG = {
    "text_encoder": None, "sigma": 5, "model_image_size": IMAGE,
    "requires_graph": False, "spatial_augment": True,
    "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
    "standardize_depth": False, "mask_depth": True, "strategy": "gmm",
}


def _ds_cfg(root, sequential=False):
    cfg = {"name": "bimanual_sequential" if sequential else "bimanual",
           "dataset_path": str(root), "image_size": IMAGE, "depth_scale": 1000,
           "is_bimanual": True, "voxel_size": 0.125, "neighbor_radius": 0.45,
           "num_nodes": 20}
    if sequential:
        cfg["max_context_length"] = 3
    return cfg


def test_zarr_lite_roundtrip(mini_dataset):
    g = open_group(mini_dataset / "vr_folding_dataset.zarr" / CATEGORY)
    assert isinstance(g, Group)
    verts = g["samples"][f"{PREFIX}_000004"]["mesh"]["cloth_verts"]
    arr = np.asarray(verts)
    assert arr.shape == (4, 3)
    assert abs(arr[0, 0] - (-0.5 + 0.12 * 2)) < 1e-6
    # fancy indexing on first axis
    np.testing.assert_array_equal(verts[[1, 3]], arr[[1, 3]])


def test_zarr_lite_zlib_chunk(tmp_path):
    import zlib
    arr = np.arange(24, dtype=np.float32).reshape(4, 6)
    p = tmp_path / "a"
    p.mkdir()
    meta = {"zarr_format": 2, "shape": [4, 6], "chunks": [4, 6],
            "dtype": "<f4", "compressor": {"id": "zlib", "level": 1},
            "fill_value": 0, "order": "C", "filters": None}
    (p / ".zarray").write_text(json.dumps(meta))
    (p / "0.0").write_bytes(zlib.compress(arr.tobytes()))
    from bifold_tpu.data.zarr_lite import Array
    np.testing.assert_array_equal(Array(p)[:], arr)


def test_bimanual_dataset_item(mini_dataset):
    from bifold_tpu.data.bimanual_dataset import BimanualDataset
    ds = BimanualDataset(_ds_cfg(mini_dataset), processor_config=PROC_CFG,
                         partition="test")
    assert len(ds) == 3
    raw = ds[0]
    assert raw["frame_start"] == f"{PREFIX}_000002"
    assert raw["frame_end"] == f"{PREFIX}_000008"
    # projection: vertex 0 at start frame 2: x = -0.5 + 0.0 -> u = 64*x/z + 32
    lp = raw["left_pick"][0]
    x0 = -0.5
    expect_u = IMAGE - (64 * x0 / 2.0 + 32)
    assert abs(lp[0] - expect_u) < 1e-3
    assert raw["rgb"].shape == (IMAGE, IMAGE, 3)
    # mask: background (max depth) zeroed
    assert raw["mask"][0, 0] == 0 and raw["mask"][32, 32] == 1


def test_bimanual_sequential_context(mini_dataset):
    from bifold_tpu.data.bimanual_dataset import BimanualDatasetSequential
    ds = BimanualDatasetSequential(_ds_cfg(mini_dataset, True),
                                   processor_config=PROC_CFG, partition="train")
    raw = ds[0]
    assert raw["ctx_count"] == 2
    assert raw["context_names"] == f"{PREFIX}_000000+{PREFIX}_000001"
    # end-to-end through the device pipeline
    from bifold_tpu.data import DataLoader
    dl = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True)
    batch = next(iter(dl))
    assert batch["rgb_context"].shape == (2, 3, 3, IMAGE, IMAGE)
    assert batch["left_pick_heatmap"].shape == (2, IMAGE, IMAGE)
    np.testing.assert_array_equal(np.asarray(batch["context_attention_mask"]),
                                  [[1, 1, 0]] * 2)


def test_action_mining(mini_dataset):
    from bifold_tpu.data.vr_folding import create_groups_df
    g = open_group(mini_dataset / "vr_folding_dataset.zarr" / CATEGORY)
    df = create_groups_df(g["samples"])
    assert len(df) == 1  # one joint action mined
    row = df.iloc[0]
    assert row["left_start_idx"] == f"{PREFIX}_000002"
    assert row["left_end_idx"] == f"{PREFIX}_000008"
    assert row["left_grip_from"] == [0]
    assert isinstance(row["text"], str) and len(row["text"]) > 10
    assert not row["bad_sequence"]


def test_partition_builder(mini_dataset, tmp_path, monkeypatch):
    import argparse
    from bifold_tpu.data.create_dataset_partitions import main
    actions_path = mini_dataset / "mined_actions"
    actions_path.mkdir(exist_ok=True)
    # builder expects actions_path next to the zarr root
    args = argparse.Namespace(actions_path=str(mini_dataset / "actions_build"),
                              train_portion=0.5, remove_bad_sequences=True,
                              seed=0)
    os.makedirs(args.actions_path, exist_ok=True)
    main(args)
    train = pd.read_csv(Path(args.actions_path) / "train.csv")
    test = pd.read_csv(Path(args.actions_path) / "test.csv")
    assert len(train) + len(test) == 1
    combined = pd.concat([train, test])
    assert "context" in combined.columns


def test_real_dataset_instructions():
    from bifold_tpu.data.real_dataset import get_instructions
    sleeves = get_instructions("long_shirt", 0)
    assert len(sleeves) == 20 and all("left" in s for s in sleeves)
    folds = get_instructions("towel", 1)
    assert len(folds) == 7 * 20  # 7 garment words x 20 fold templates
    with pytest.raises(ValueError):
        get_instructions("towel", 5)


def test_filter_bad_meshes():
    from bifold_tpu.data.vr_folding import filter_bad_meshes
    rng = np.random.default_rng(0)
    n = 10
    xs, zs = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
    verts = np.stack([xs, np.zeros_like(xs), zs], -1).reshape(-1, 3)
    faces = []
    for j in range(n - 1):
        for i in range(n - 1):
            a = j * n + i
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    faces = np.asarray(faces)
    nocs = verts + rng.normal(0, 1e-4, verts.shape)
    good = verts + rng.normal(0, 1e-4, verts.shape)
    assert not filter_bad_meshes(good, nocs, faces)
    bad = good.copy()
    bad[0] += 50.0  # one exploded vertex
    assert filter_bad_meshes(bad, nocs, faces)

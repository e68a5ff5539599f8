"""Unimanual pkl datasets on fabricated files (reference
bifold/data/single_dataset{_sequential}.py schemas)."""

import pickle

import numpy as np
import pytest

SIZE = 96

PROC_CFG = {
    "text_encoder": None, "sigma": 5, "model_image_size": 48,
    "requires_graph": False, "spatial_augment": False,
    "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
    "standardize_depth": False, "mask_depth": True, "strategy": "gmm",
}


@pytest.fixture(scope="module")
def single_pkl(tmp_path_factory):
    root = tmp_path_factory.mktemp("single_data")
    rng = np.random.default_rng(0)
    n = 6
    data = {
        "rgbs": [rng.integers(0, 255, (SIZE, SIZE, 3), dtype=np.uint8)
                 for _ in range(n)],
        # stored scaled by 255 (depth_scale), cloth below the 0.996 threshold
        "depth": [np.full((SIZE, SIZE), 254.9, np.float32)
                  - 30 * (rng.random((SIZE, SIZE)) > 0.7)
                  for _ in range(n)],
        "pick": [rng.uniform(10, 80, 2) for _ in range(n)],
        "place": [rng.uniform(10, 80, 2) for _ in range(n)],
        "instruction": [f"fold corner {i}" for i in range(n)],
    }
    path = root / "All_6.pkl"
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return path


@pytest.fixture(scope="module")
def sequential_pkl(tmp_path_factory):
    root = tmp_path_factory.mktemp("single_seq")
    rng = np.random.default_rng(1)
    episodes = []
    for _ in range(2):
        steps = 3
        episodes.append({
            "rgbs": [rng.integers(0, 255, (SIZE, SIZE, 3), dtype=np.uint8)
                     for _ in range(steps)],
            "depth": [np.full((SIZE, SIZE), 254.0, np.float32)
                      for _ in range(steps)],
            "pick": [rng.uniform(10, 80, 2) for _ in range(steps)],
            "place": [rng.uniform(10, 80, 2) for _ in range(steps)],
            "instruction": [f"step {i}" for i in range(steps)],
        })
    path = root / "All_seq.pkl"
    with open(path, "wb") as f:
        pickle.dump({"episodes": episodes}, f)
    return path


def test_single_dataset(single_pkl):
    from bifold_tpu.data.datasets import SingleDataset

    cfg = {"name": "single", "dataset_path": str(single_pkl),
           "depth_scale": 255, "image_size": 48, "is_bimanual": False,
           "voxel_size": 0.0125, "neighbor_radius": 0.045, "num_nodes": 20}
    ds = SingleDataset(cfg, processor_config=PROC_CFG, partition="train")
    assert len(ds) == 6
    raw = ds[0]
    # depth scaled into [0, 1] and mask from the 0.996 threshold
    assert raw["depth"].max() <= 1.0
    assert 0 < raw["mask"].mean() < 1
    assert raw["pick"].shape == (8, 2)
    assert raw["matrix_world_to_camera"].shape == (4, 4)
    # through the loader: gaussmap targets at train
    from bifold_tpu.data import DataLoader
    batch = next(iter(DataLoader(ds, batch_size=2, shuffle=False, drop_last=True)))
    assert batch["pick_heatmap"].shape == (2, 48, 48)


def test_single_sequential_dataset(sequential_pkl):
    from bifold_tpu.data.datasets import SingleDatasetSequential

    cfg = {"name": "single_sequential", "dataset_path": str(sequential_pkl),
           "depth_scale": 255, "image_size": 48, "is_bimanual": False,
           "max_context_length": 3, "voxel_size": 0.0125,
           "neighbor_radius": 0.045, "num_nodes": 20}
    ds = SingleDatasetSequential(cfg, processor_config=PROC_CFG,
                                 partition="train")
    assert len(ds) == 6  # 2 episodes x 3 steps
    # third step of an episode carries its two predecessors as context
    raw = ds[2]
    assert raw["ctx_count"] == 2
    raw0 = ds[0]
    assert raw0["ctx_count"] == 0

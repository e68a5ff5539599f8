"""RealDataset on a fabricated capture tree (reference
bifold/data/real_dataset.py semantics: grouped exposures, median depth,
instruction paraphrase expansion, symmetric GT sets)."""

import numpy as np
import pytest
from PIL import Image

IMAGE = 48


@pytest.fixture(scope="module")
def real_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("bimanual_real")
    cat = root / "towel"
    for sub in ("cropped_raw_depth", "cropped_rgb", "cropped_mask",
                "cropped_annotations"):
        (cat / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    # capture "05_towel_0" with 2 depth exposures (suffix = exposure index)
    for exposure in range(2):
        stem = f"05_towel_0_{exposure}"
        depth = np.full((IMAGE, IMAGE), 800 + exposure * 20, np.float32)
        np.save(cat / "cropped_raw_depth" / f"{stem}.npy", depth)
        Image.fromarray(rng.integers(0, 255, (IMAGE, IMAGE, 3), dtype=np.uint8)
                        ).save(cat / "cropped_rgb" / f"{stem}.png")
        m = np.zeros((IMAGE, IMAGE, 3), np.uint8)
        m[10:40, 10:40] = 255
        Image.fromarray(m).save(cat / "cropped_mask" / f"{stem}.png")
    # GT: one row of [lp, lpl, rp, rpl] pixel pairs
    np.save(cat / "cropped_annotations" / "05_towel_0.npy",
            np.array([12.0, 14.0, 30.0, 32.0, 20.0, 22.0, 38.0, 36.0]))
    (root / "empty").mkdir()
    return root


def test_real_dataset_items(real_root):
    from bifold_tpu.data.real_dataset import RealDataset

    cfg = {"name": "real", "dataset_path": str(real_root), "depth_scale": 1000,
           "is_bimanual": True, "voxel_size": 0.0125, "neighbor_radius": 0.045,
           "num_nodes": 20, "max_context_length": 3, "image_size": IMAGE}
    proc_cfg = {"model_image_size": IMAGE, "text_encoder": None, "sigma": 5,
                "requires_graph": False, "spatial_augment": False,
                "strategy": "gmm", "mask_depth": True, "standardize_depth": False}
    ds = RealDataset(cfg, processor_config=proc_cfg, partition="test")
    # towel instruction_idx 0 -> 7 garments x 20 fold templates
    assert len(ds) == 140
    raw = ds[0]
    # median of the two exposures: (800 + 820)/2 / 1000
    assert abs(float(raw["depth"][0, 0]) - 0.810) < 1e-6
    # symmetric labels: each arm's pick set holds all four endpoint groups
    assert raw["left_pick"].shape == (8, 2)
    assert (raw["left_pick"][:4] >= 0).all()
    np.testing.assert_allclose(raw["left_pick"][0], [12.0, 14.0])
    np.testing.assert_allclose(raw["right_pick"][0], [20.0, 22.0])
    assert isinstance(raw["raw_instruction"], str)
    assert "towel" in raw["raw_instruction"] or "cloth" in raw["raw_instruction"] \
        or "shirt" in raw["raw_instruction"] or "trousers" in raw["raw_instruction"] \
        or "pants" in raw["raw_instruction"] or "top" in raw["raw_instruction"] \
        or "skirt" in raw["raw_instruction"]


def test_real_dataset_train_partition_rejected(real_root):
    from bifold_tpu.data.real_dataset import RealDataset

    cfg = {"name": "real", "dataset_path": str(real_root), "depth_scale": 1000,
           "is_bimanual": True, "voxel_size": 0.0125, "neighbor_radius": 0.045,
           "num_nodes": 20, "max_context_length": 3, "image_size": IMAGE}
    proc_cfg = {"model_image_size": IMAGE, "text_encoder": None, "sigma": 5,
                "requires_graph": False, "spatial_augment": False,
                "strategy": "gmm", "mask_depth": True, "standardize_depth": False}
    with pytest.raises(AssertionError):
        RealDataset(cfg, processor_config=proc_cfg, partition="train")

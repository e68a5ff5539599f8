"""Dataset registry + dataloader assembly.

Counterpart of /root/reference/bifold/data/__init__.py: ``Datasets`` registry
keyed by config ``name`` and :func:`get_dataloaders` wiring
(train shuffled + drop_last, test sequential, test defaults to the train
dataset when ``test_dataset.name`` is null, the test set's Processor returned
for rollout-time reuse).
"""

from __future__ import annotations

from typing import Optional

from bifold_tpu.core.registry import Registry
from bifold_tpu.data.datasets import (
    BaseDataset,
    SingleDataset,
    SingleDatasetSequential,
    SyntheticDataset,
)
from bifold_tpu.data.loader import DataLoader, collate
from bifold_tpu.data.processor import DUMMY, Processor

__all__ = ["Datasets", "BaseDataset", "DataLoader", "Processor", "DUMMY",
           "collate", "get_dataloaders"]

Datasets: Registry = Registry("dataset")
Datasets.register("single")(SingleDataset)
Datasets.register("single_sequential")(SingleDatasetSequential)
Datasets.register("synthetic")(SyntheticDataset)


@Datasets.register("bimanual")
def _bimanual(*args, **kwargs):
    from bifold_tpu.data.bimanual_dataset import BimanualDataset
    return BimanualDataset(*args, **kwargs)


@Datasets.register("bimanual_sequential")
def _bimanual_sequential(*args, **kwargs):
    from bifold_tpu.data.bimanual_dataset import BimanualDatasetSequential
    return BimanualDatasetSequential(*args, **kwargs)


@Datasets.register("real")
def _real(*args, **kwargs):
    from bifold_tpu.data.real_dataset import RealDataset
    return RealDataset(*args, **kwargs)


def build_dataset(dataset_cfg, processor_cfg, partition: str,
                  autoprocessor_name: Optional[str] = None, seed: int = 0):
    name = dict(dataset_cfg)["name"]
    cls = Datasets.get(name)
    return cls(dataset_cfg, processor_config=processor_cfg, partition=partition,
               autoprocessor_name=autoprocessor_name, seed=seed)


def get_dataloaders(cfg):
    """(train_dl | None, test_dl, processor) per the reference's wiring
    (data/__init__.py:46-95)."""
    automodel = dict(cfg["model"]).get("automodel_name")
    seed = int(dict(cfg).get("seed", 0))

    train_dataloader = None
    if not cfg["eval_only"]:
        train_dataset = build_dataset(cfg["train_dataset"], cfg["processor"],
                                      partition="train",
                                      autoprocessor_name=automodel, seed=seed)
        if cfg.get("debug"):
            train_dataset[0]
        train_dataloader = DataLoader(
            train_dataset, batch_size=cfg["batch_size"], shuffle=True, seed=seed)

    test_cfg = cfg["test_dataset"]
    if dict(test_cfg).get("name") is None:
        test_cfg = cfg["train_dataset"]
    test_dataset = build_dataset(test_cfg, cfg["processor"], partition="test",
                                 autoprocessor_name=automodel, seed=seed)
    if cfg.get("debug"):
        test_dataset[0]
    test_dataloader = DataLoader(
        test_dataset, batch_size=cfg.get("test_batch_size", cfg["batch_size"]),
        shuffle=False, drop_last=False)
    return train_dataloader, test_dataloader, test_dataset.processor

"""CLI entrypoint: ``python -m bifold_tpu [overrides...]``.

Counterpart of /root/reference/bifold/__main__.py:24-35 (hydra.main): compose
the config from ``bifold_tpu/conf`` with Hydra-style overrides
(``model=siglip``, ``optim.lr=1e-3``, ``+k=v``, ``~k``), build the run dir
(``<run_dir>/<override_dirname>``), snapshot the composed config, then train
and/or evaluate.
"""

from __future__ import annotations

import sys
from pathlib import Path

from bifold_tpu.config import Config, compose
from bifold_tpu.trainer import Trainer

# overrides that should not change the run-dir identity (reference
# conf/config.yaml hydra.job.config.override_dirname exclude list)
_NON_SEMANTIC = {"use_wandb", "num_workers", "debug", "eval_only", "load_best",
                 "visualize_model_inputs", "visualize_predictions", "run_dir",
                 "log_every"}


def override_dirname(overrides: list[str]) -> str:
    parts = []
    for ov in overrides:
        key = ov.lstrip("+~").split("=")[0]
        if key.split(".")[0] in _NON_SEMANTIC:
            continue
        parts.append(ov.replace("/", "_"))
    return ",".join(parts) or "default"


def main(argv: list[str] | None = None) -> int:
    overrides = list(sys.argv[1:] if argv is None else argv)
    if "--help" in overrides or "-h" in overrides:
        print(__doc__)
        print("Groups: model, dataset@train_dataset, dataset@test_dataset, "
              "processor, loss, optim, scheduler")
        return 0
    cfg = compose(overrides)
    if cfg.get("use_cpu"):
        # reference parity (__main__.py:40-44 device select): force the CPU
        # backend BEFORE any jax op — also the escape hatch when the TPU
        # runtime is unreachable. A plain JAX_PLATFORMS env var is not
        # enough on hosts whose sitecustomize re-registers a TPU plugin.
        import jax
        jax.config.update("jax_platforms", "cpu")
    # multi-host / multi-slice: bring the multi-process runtime up before the
    # first jax op (no-op without JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES);
    # the loader and parallel.shard_batch then feed per-process shards
    from bifold_tpu import parallel
    parallel.distributed_init()
    dirname = override_dirname(overrides)
    run_dir = Path(cfg["run_dir"]) / dirname
    # run naming mirrors the reference's wandb wiring: name = override
    # string, group = train dataset (reference __main__.py:46-53)
    trainer = Trainer(Config(cfg), run_dir=run_dir, run_name=dirname)
    if not cfg["eval_only"]:
        trainer.prepare_train()
        trainer.train()
        if trainer.preempted:
            # the SIGTERM deadline is short on managed VMs: the checkpoint
            # is written, skip the final eval and exit promptly
            return 0
    trainer.eval()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

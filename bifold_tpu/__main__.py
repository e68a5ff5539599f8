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


_MESH_AXES = ("dcn", "dp", "fsdp", "tp", "pp", "sp", "ep")


def _advise(args: list[str]) -> int:
    """``python -m bifold_tpu advise [layouts...] [n_devices=N] [overrides]``

    Mesh-layout advisor on the CLI (parallel/advisor.py): AOT-compile the
    composed config's sharded train step for each candidate layout on an
    ``n_devices``-way VIRTUAL cpu mesh (no TPU needed, nothing executes) and
    rank by compiled wire traffic + roofline step-time lower bound. Layout
    args are comma-separated ``axis=size`` specs whose keys are all mesh
    axes (e.g. ``dp=2,fsdp=2,tp=2``); with none given, every (dp, fsdp, tp)
    factorization of ``n_devices`` is swept. pp/ep layouts analyze the REAL
    pipelined / expert-parallel program (the active-mesh routing the Trainer
    uses). Remaining args are config overrides (pick the model/batch here).
    """
    import json as _json
    import os

    layouts, n_devices, overrides, as_json = [], 8, [], False
    for a in args:
        keys = {p.partition("=")[0].strip() for p in
                a.replace(";", ",").split(",") if p.strip()}
        if a == "--json":
            as_json = True
        elif keys and keys <= set(_MESH_AXES):
            layouts.append({k: int(v) for k, _, v in
                            (p.strip().partition("=") for p in
                             a.replace(";", ",").split(",") if p.strip())})
        elif keys == {"n_devices"}:
            n_devices = int(a.partition("=")[2])
        else:
            overrides.append(a)
    cfg = compose(overrides)
    if not layouts:
        layouts = [{"dp": dp, "fsdp": fsdp, "tp": n_devices // (dp * fsdp)}
                   for dp in range(1, n_devices + 1)
                   for fsdp in range(1, n_devices + 1)
                   if n_devices % (dp * fsdp) == 0]

    # compile-only on a virtual CPU mesh: force the host platform device
    # count BEFORE the first backend init (jax may already be imported —
    # XLA_FLAGS is read lazily at CPU-client creation, so this still works)
    flag = f"--xla_force_host_platform_device_count={n_devices}"
    prev = [f for f in os.environ.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f]
    os.environ["XLA_FLAGS"] = " ".join(prev + [flag])
    import jax
    jax.config.update("jax_platforms", "cpu")

    from bifold_tpu.parallel.advisor import scale_report
    devs = jax.devices()
    if len(devs) < n_devices:
        # backend was already initialized (e.g. under pytest) — the forced
        # host count can no longer grow; analyze what fits
        print(f"[advise] only {len(devs)} virtual devices available "
              f"(backend already initialized); pass n_devices<= that")
        return 1
    reports = scale_report(layouts, batch=int(cfg["batch_size"]),
                           model_cfg=dict(cfg["model"]),
                           devices=devs[:n_devices])
    if as_json:
        print(_json.dumps(reports))
        return 0
    gib = 1 << 30
    print(f"mesh-layout advisor: model={cfg['model']['name']} "
          f"batch={cfg['batch_size']} over {n_devices} devices "
          f"({len(reports)} layouts; roofline lower bounds, best first)")
    for i, r in enumerate(reports, 1):
        if "error" in r:
            print(f"  {i}. {r['mesh']}  FAILED "
                  f"({r['error'].splitlines()[0][:90]})")
            continue
        est, wire = r["est"], r["collective_wire_bytes_per_device"]
        print(f"  {i}. {r['mesh']}  >= {est['step_ms_lower_bound']:.2f} "
              f"ms/step ({est['bottleneck']}-bound; wire "
              f"{wire / (1 << 20):,.1f} MiB/dev, params+opt "
              f"{(r['param_bytes_per_device'] + r['opt_state_bytes_per_device']) / gib:.2f} "
              f"GiB/dev)")
    best = next((r for r in reports if "error" not in r), None)
    if best is not None:
        rec = ",".join(f"mesh.{k}={v}" for k, v in best["mesh"].items()
                       if v > 1) or "mesh.dp=1"
        print(f"recommended: {rec.replace(',', ' ')}")
    return 0


def main(argv: list[str] | None = None) -> int:
    overrides = list(sys.argv[1:] if argv is None else argv)
    if overrides and overrides[0] == "advise":
        if "--help" in overrides or "-h" in overrides:
            print(_advise.__doc__)
            return 0
        return _advise(overrides[1:])
    if "--help" in overrides or "-h" in overrides:
        print(__doc__)
        print("Groups: model, dataset@train_dataset, dataset@test_dataset, "
              "processor, loss, optim, scheduler")
        print("Subcommands: advise — rank candidate mesh layouts for the "
              "composed config (python -m bifold_tpu advise --help)")
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

"""Mesh-layout advisor: compile the real sharded train step for candidate
mesh layouts and report what the compiler actually scheduled.

The scaling playbook for TPU pods ("pick a mesh, annotate shardings, let XLA
insert collectives, profile, iterate") has a bootstrapping problem: you want
to pick the mesh *before* you have the pod. This module closes the loop
without hardware by AOT-compiling the production train step
(:func:`bifold_tpu.parallel.make_train_step` — the exact program Trainer
runs) over an ``n``-device virtual mesh for each candidate layout, then
mining the *optimized* HLO and the compiler's own cost model for:

- per-collective wire traffic (all-gather / all-reduce / reduce-scatter /
  all-to-all / collective-permute), counted with ring-algorithm byte
  formulas over the actual replica-group sizes,
- per-device FLOPs and HBM bytes (``compiled.cost_analysis()``),
- per-device parameter + optimizer-state residency under the layout's
  actual shardings (what decides whether the model *fits*),
- a roofline lower-bound step time from configurable chip constants
  (defaults: TPU v5e — 197 TF bf16, 819 GB/s HBM, 2x45 GB/s ICI per axis),
  with the bottleneck named.

Estimates are lower bounds, not predictions — overlap, fusion quality and
latency-bound collectives are not modeled — but the *relative* ranking and
the fit/traffic numbers come from real compiled programs, so layouts that
all-gather activations or blow HBM are exposed before a single chip-hour is
spent. Drive it via ``python tools/scale_report.py``.

No reference counterpart (Barbany/bifold is single-GPU torch); this is part
of the parallelism layer that exists only in the TPU rebuild.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

__all__ = ["analyze_layout", "scale_report", "V5E"]

# chip constants for the roofline estimate; override per call
V5E = {
    "name": "tpu-v5e",
    "peak_flops": 197e12,        # bf16 MXU peak
    "hbm_bytes_per_s": 819e9,
    # ring-collective per-device throughput over one mesh axis: one ICI
    # axis, 45 GB/s per direction, both directions active in a ring
    "ici_bytes_per_s": 90e9,
}

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

_COLLECTIVE_RE = re.compile(
    r"= (?P<result>[^=]+?) "
    r"(?P<kind>all-gather|all-reduce|reduce-scatter|all-to-all"
    r"|collective-permute)"
    r"(?P<start>-start)?\(")
_SHAPE_RE = re.compile(r"(\w+)\[([0-9,]*)\]")
_GROUPS_BRACE_RE = re.compile(r"replica_groups=\{\{([0-9, ]+)\}")
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]<=")


def _group_size(line: str, n_devices: int) -> int:
    m = _GROUPS_IOTA_RE.search(line)
    if m:  # iota format [G,S]<=[N]: G groups of S participants
        return max(1, int(m.group(2)))
    m = _GROUPS_BRACE_RE.search(line)
    if m:
        return max(1, len(m.group(1).split(",")))
    return n_devices


def _wire_bytes(kind: str, result_bytes: int, g: int) -> int:
    """Per-device wire traffic of one ring-algorithm collective.

    ``result_bytes`` is the op's RESULT shape as printed in the HLO —
    the gathered (large) tensor for all-gather, the scattered (small) shard
    for reduce-scatter, the unchanged size for all-reduce / all-to-all /
    collective-permute.
    """
    if g <= 1:
        return 0
    if kind == "all-gather":
        return result_bytes * (g - 1) // g
    if kind == "reduce-scatter":
        return result_bytes * (g - 1)          # full input = result * g
    if kind == "all-reduce":
        return 2 * result_bytes * (g - 1) // g  # reduce-scatter + all-gather
    if kind == "all-to-all":
        return result_bytes * (g - 1) // g
    return result_bytes                         # collective-permute


def _result_bytes(result: str, kind: str, is_start: bool) -> int:
    """Bytes of a collective's RESULT type.

    Plain ops print one array type; a fused variadic op prints a tuple of
    N outputs, all of which count. Async ``-start`` ops print a tuple of
    (operand buffers..., output buffers...) — the first half aliases the
    inputs, so only the second half (the outputs) counts.
    """
    shapes = _SHAPE_RE.findall(result)
    shapes = [(d, dims) for d, dims in shapes if d in _DTYPE_BYTES]
    if not shapes:
        return 0
    if is_start and result.lstrip().startswith("(") and len(shapes) % 2 == 0:
        shapes = shapes[len(shapes) // 2:]
    total = 0
    for dtype, dims in shapes:
        size = _DTYPE_BYTES[dtype]
        for d in filter(None, dims.split(",")):
            size *= int(d)
        total += size
    return total


def _parse_collectives(hlo: str, n_devices: int) -> dict:
    """Aggregate optimized-HLO collectives: count + result + wire bytes."""
    out: dict = {}
    for line in hlo.splitlines():
        m = _COLLECTIVE_RE.search(line)
        if not m:
            continue
        kind = m.group("kind")
        size = _result_bytes(m.group("result"), kind, bool(m.group("start")))
        if size == 0:
            continue
        g = _group_size(line, n_devices)
        agg = out.setdefault(kind, {"count": 0, "result_bytes": 0,
                                    "wire_bytes": 0})
        agg["count"] += 1
        agg["result_bytes"] += size
        agg["wire_bytes"] += _wire_bytes(kind, size, g)
    return out


def _leaf_shard_bytes(shapes, shardings) -> int:
    """Per-device bytes of a pytree under its NamedShardings."""
    import jax

    total = 0
    for leaf, sh in zip(jax.tree_util.tree_leaves(shapes),
                        jax.tree_util.tree_leaves(
                            shardings, is_leaf=lambda x: hasattr(
                                x, "shard_shape"))):
        shard = sh.shard_shape(leaf.shape)
        n = leaf.dtype.itemsize
        for d in shard:
            n *= d
        total += n
    return total


_TINY_MODEL = {
    "name": "siglip_sequential", "image_size": 32, "is_bimanual": True,
    "patch_size": 16, "automodel_name": "tiny", "dim": 64, "lora": True,
    "r": 4, "depth": 2, "heads": 4, "context_length": 2,
}

_FLAGSHIP_MODEL = {
    "name": "siglip_sequential", "image_size": 384, "is_bimanual": True,
    "patch_size": 16, "automodel_name": "google/siglip-base-patch16-384",
    "dim": 768, "lora": True, "r": 8, "lora_alpha": 32, "depth": 8,
    "heads": 16, "context_length": 3,
}


def analyze_layout(mesh_cfg: dict, *, batch: int = 8,
                   model_cfg: Optional[dict] = None,
                   devices: Optional[list] = None,
                   chip: Optional[dict] = None,
                   unroll: bool = False) -> dict:
    """Compile the sharded train step under ``mesh_cfg`` and report traffic,
    residency and a roofline estimate. Compile-only — nothing executes, so
    any layout that fits the host's compiler works, including device counts
    larger than the real machine (force a bigger virtual CPU host platform).

    ``unroll=True`` unrolls the nn.scan transformer stacks so
    ``cost_analysis`` FLOPs are exact (a rolled scan body is counted once —
    a ~4x undercount at flagship depth); rankings are unaffected either way
    because the undercount is identical across layouts.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bifold_tpu import parallel
    from bifold_tpu.losses import build_loss
    from bifold_tpu.models import build_model, trainable_mask
    from bifold_tpu.optim import build_optimizer

    chip = dict(chip or V5E)
    model_cfg = dict(model_cfg or _FLAGSHIP_MODEL)
    devices = list(devices if devices is not None else jax.devices())
    mesh = parallel.make_mesh(dict(mesh_cfg), devices=devices)
    n_devices = mesh.devices.size
    # pp/ep layouts route through gpipe / expert_parallel_ffn at trace time
    # via the active-mesh registry (exactly what the Trainer sets) — so the
    # analyzed program IS the pipelined/expert-parallel one, not the dense
    # single-program fallback
    prev_mesh = parallel.active_mesh()
    prev_pp_mb = parallel.active_pp_microbatches()
    parallel.set_active_mesh(mesh)

    saved = {k: os.environ.get(k)
             for k in ("BIFOLD_ATTN_BACKEND", "BIFOLD_FLASH_INTERPRET",
                       "BIFOLD_SCAN_UNROLL")}
    if jax.default_backend() not in ("tpu", "axon"):
        # route attention through the REAL flash partitioning (interpreted)
        # so the compiled collectives match the production TPU program
        os.environ["BIFOLD_ATTN_BACKEND"] = "flash"
        os.environ["BIFOLD_FLASH_INTERPRET"] = "1"
    if unroll:
        os.environ["BIFOLD_SCAN_UNROLL"] = "1"
    try:
        import numpy as np

        model = build_model(model_cfg, dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        s = int(model_cfg["image_size"])
        ctx = int(model_cfg.get("context_length", 3))
        heads = ("left_pick", "right_pick", "left_place", "right_place")
        b = {
            "rgb": jnp.asarray(rng.standard_normal((batch, 3, s, s)),
                               jnp.float32),
            "depth": jnp.asarray(rng.random((batch, 1, s, s)), jnp.float32),
            "mask": jnp.asarray((rng.random((batch, 1, s, s)) > 0.5),
                                jnp.float32),
            "instruction": jnp.asarray(
                rng.integers(0, 30000, (batch, 64)), jnp.int32),
            "rgb_context": jnp.asarray(
                rng.standard_normal((batch, ctx, 3, s, s)), jnp.float32),
            "context_attention_mask": jnp.asarray(
                rng.integers(0, 2, (batch, ctx)), jnp.int32),
            **{f"{h}_heatmap": jnp.asarray(rng.random((batch, s, s)),
                                           jnp.float32) for h in heads},
        }
        pshapes = jax.eval_shape(
            lambda: model.init(jax.random.key(0), b, deterministic=True)
        )["params"]
        mask = trainable_mask(pshapes, lora=bool(model_cfg.get("lora")))
        tx, _ = build_optimizer(
            {"name": "adam", "lr": 1e-4, "betas": [0.9, 0.999],
             "eps": 1e-8, "weight_decay": 0}, None, max_iters=100,
            trainable=mask, gradient_clip=1.0)
        oshapes = jax.eval_shape(tx.init, pshapes)
        psh = parallel.param_sharding(mesh, pshapes)
        osh = parallel.param_sharding(mesh, oshapes)

        def sds(shapes, shardings):
            return jax.tree_util.tree_map(
                lambda sd, h: jax.ShapeDtypeStruct(sd.shape, sd.dtype,
                                                   sharding=h),
                shapes, shardings)

        bsh = parallel.batch_sharding(mesh)
        b_sds = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=bsh),
            b)
        kshape = jax.eval_shape(lambda: jax.random.key(0))
        key_sds = jax.ShapeDtypeStruct(kshape.shape, kshape.dtype,
                                       sharding=NamedSharding(mesh, P()))
        loss_fn = build_loss({"name": "bce_gaussmap", "is_bimanual": True,
                              "mask_pick_heatmap": False})
        step = parallel.make_train_step(model, loss_fn, tx, donate=True,
                                        trainable=mask)
        compiled = step.lower(
            (sds(pshapes, psh), sds(oshapes, osh), {}, key_sds),
            b_sds).compile()

        hlo = compiled.as_text()
        collectives = _parse_collectives(hlo, n_devices)
        cost = {}
        try:
            c = compiled.cost_analysis()
            cost = c[0] if isinstance(c, (list, tuple)) else (c or {})
        except Exception:
            pass
        mem = {}
        try:
            ma = compiled.memory_analysis()
            for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                      "output_size_in_bytes", "generated_code_size_in_bytes"):
                v = getattr(ma, k, None)
                if v is not None:
                    mem[k] = int(v)
        except Exception:
            pass

        flops = float(cost.get("flops", 0.0))
        hbm_bytes = float(cost.get("bytes accessed", 0.0))
        wire = sum(v["wire_bytes"] for v in collectives.values())
        est = {
            "compute_ms": 1e3 * flops / chip["peak_flops"],
            "hbm_ms": 1e3 * hbm_bytes / chip["hbm_bytes_per_s"],
            "ici_ms": 1e3 * wire / chip["ici_bytes_per_s"],
        }
        est["bottleneck"] = max(
            ("compute_ms", "hbm_ms", "ici_ms"), key=lambda k: est[k])
        est["step_ms_lower_bound"] = est[est["bottleneck"]]
        return {
            "mesh": dict(mesh.shape),
            "n_devices": n_devices,
            "batch_global": batch,
            "chip": chip["name"],
            "flops_per_device": flops,
            "flops_exact": bool(unroll),
            "hbm_bytes_per_device": hbm_bytes,
            "param_bytes_per_device": _leaf_shard_bytes(pshapes, psh),
            "opt_state_bytes_per_device": _leaf_shard_bytes(oshapes, osh),
            "memory_analysis": mem,
            "collectives": collectives,
            "collective_wire_bytes_per_device": wire,
            "est": est,
        }
    finally:
        # restore the CALLER's routing, not None — an advisory pass in the
        # same process as a live Trainer (mesh.pp/ep > 1) must not switch
        # its subsequent re-traces to the dense fallback
        parallel.set_active_mesh(prev_mesh, pp_microbatches=prev_pp_mb)
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def scale_report(layouts: list, **kwargs: Any) -> list:
    """Analyze each candidate layout and return reports sorted by the
    roofline step-time lower bound (best first). A layout that fails to
    compile is itself an advisory result — it is reported as
    ``{"mesh": ..., "error": ...}`` and ranked last instead of aborting
    the sweep."""
    reports = []
    for layout in layouts:
        try:
            reports.append(analyze_layout(layout, **kwargs))
        except Exception as e:  # noqa: BLE001 — surface per-layout failures
            reports.append({"mesh": dict(layout), "error": f"{type(e).__name__}: {e}"})
    return sorted(reports, key=lambda r: (
        "error" in r, r.get("est", {}).get("step_ms_lower_bound", 0.0)))

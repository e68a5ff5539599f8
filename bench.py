"""Benchmark: flagship training throughput (samples/sec/chip) on real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

- Model: SiglipSequential at the shipped bimanual configuration (image 384,
  dim 768, 12-layer towers, 8-layer fusion, 3 context frames, 4 heatmap
  heads, LoRA-frozen towers) — the reference's training config
  (conf/model/siglip_sequential.yaml, batch hyperparams conf/config.yaml).
- Step: the real Trainer code path — on-device Processor batch transform +
  jitted SPMD train step (loss, grads, masked Adam) with donated state.
- Baseline: the measured torch-CPU architecture-equivalent step from
  BENCH_BASELINE.json (scripts/measure_torch_baseline.py) — the reference is
  single-process torch; there is no GPU in this environment.
- Extra: batch-1 img+text->action p50 latency (BASELINE.md target < 20 ms).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent


def _flagship(batch: int, image_size: int = 384, context: int = 3):
    import jax
    import jax.numpy as jnp

    from bifold_tpu import parallel
    from bifold_tpu.losses import build_loss
    from bifold_tpu.models import build_model, precast_frozen, trainable_mask
    from bifold_tpu.optim import build_optimizer

    model = build_model({
        "name": "siglip_sequential", "image_size": image_size,
        "is_bimanual": True, "patch_size": 16,
        "automodel_name": f"google/siglip-base-patch16-{image_size}",
        "dim": 768, "lora": True, "r": 8, "lora_alpha": 32,
        "depth": 8, "heads": 16, "context_length": context,
        "remat": bool(int(__import__("os").environ.get("BIFOLD_BENCH_REMAT", "0"))),
    }, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    s = image_size
    raw = {
        "rgb": rng.integers(0, 255, (batch, s, s, 3), dtype=np.uint8),
        "depth": rng.random((batch, s, s), dtype=np.float32),
        "mask": (rng.random((batch, s, s)) > 0.5).astype(np.float32),
        "ctx_rgb": rng.integers(0, 255, (batch, context, s, s, 3), dtype=np.uint8),
        "ctx_depth": rng.random((batch, context, s, s), dtype=np.float32),
        "ctx_mask": np.ones((batch, context, s, s), np.float32),
        "ctx_count": np.full((batch,), context, np.int32),
        "label_keys": ("left_pick", "left_place", "right_pick", "right_place"),
    }
    for k in raw["label_keys"]:
        lab = -np.ones((batch, 8, 2), np.float32)
        lab[:, 0] = rng.uniform(50, 300, (batch, 2))
        raw[k] = lab

    from bifold_tpu.data.processor import Processor
    from bifold_tpu.data.tokenizers import ensure_spm_fixture
    ensure_spm_fixture()  # exact Viterbi tokenization, never hash fallback
    # spatial_augment OFF: augmentation runs on host OUTSIDE the timed step
    # (values only — the compiled program and its timing are identical), and
    # the un-augmented batch is bitwise what the test-partition serve
    # processor produces (asserted equal in the r5 session), so the
    # serve-side decision check (tools/int8_fullscale_check.py) probes the
    # trained model with EXACTLY the memorized sample. With augmentation on,
    # the probe (raw sample 0) differs from the warped training view and the
    # 400-step overfit's peaks need not transfer: measured 2026-08-20,
    # served margins collapsed to ~3e-4 (vs 0.77-0.79 with the views
    # matched) even though the training labels and loss were healthy.
    proc = Processor(
        {"model_image_size": s, "text_encoder": None, "sigma": 5,
         "requires_graph": False, "spatial_augment": False, "strategy": "gmm",
         "mask_depth": True, "standardize_depth": False},
        partition="train", max_context_length=context,
        autoprocessor_name="siglip")
    # REAL tokenized instructions (not random ids): serve-side checks
    # (tools/int8_fullscale_check.py) probe the trained model with text
    # through the SAME tokenizer — random ids would put the probe's (small,
    # spm-fixture) id range out of the training distribution and flatten
    # the overfit heatmaps
    pool = ("fold the left sleeve inward",
            "fold the towel from left to right",
            "fold the tshirt in half from bottom to top",
            "fold the trousers vertically in the middle",
            "drag the cloth to the center", "fold both sleeves inward",
            "fold the towel diagonally", "flatten the cloth")
    raw["instruction"] = np.stack(
        [proc.tokenize(pool[i % len(pool)]) for i in range(batch)])

    batch_proc = proc.process_batch(raw)
    device_batch = {k: jnp.asarray(v) for k, v in batch_proc.items()
                    if not isinstance(v, (list, tuple))}

    # jit the init: eager init dispatches thousands of tiny ops (very slow
    # over a remote-TPU tunnel); one compiled program instead
    params = jax.jit(
        lambda k: model.init(k, device_batch, deterministic=True)
    )(jax.random.key(0))["params"]
    loss_fn = build_loss({"name": "bce_gaussmap", "is_bimanual": True,
                          "mask_pick_heatmap": False})
    mask = trainable_mask(params, lora=True)
    # frozen towers pre-cast to bf16 (the trainer's precast_frozen default):
    # kills the per-step f32->bf16 weight converts + halves frozen reads
    if bool(int(__import__("os").environ.get("BIFOLD_BENCH_PRECAST", "1"))):
        params = precast_frozen(params, mask, jnp.bfloat16)
    tx, _ = build_optimizer(
        {"name": "adam", "lr": 1e-4, "betas": [0.9, 0.999], "eps": 1e-8,
         "weight_decay": 0}, None, max_iters=100,
        trainable=mask,
        gradient_clip=1.0)  # repeated random batch diverges unclipped
    opt_state = tx.init(params)
    step = parallel.make_train_step(model, loss_fn, tx, donate=True,
                                    trainable=mask)
    return model, proc, raw, device_batch, params, opt_state, step


def bench_train(batch: int, steps: int = 10, warmup: int = 2):
    import os

    import jax
    import jax.numpy as jnp

    from bifold_tpu import parallel

    (model, proc, raw, device_batch, params, opt_state,
     step) = _flagship(batch)
    # steps_per_dispatch: fuse k steps into ONE lax.scan program (the
    # shipped trainer path, conf/config.yaml steps_per_dispatch) — measured
    # 84.6 -> 81.7 ms/step at k=8 (BENCH_NOTES.md scan_steps_ab), numerics
    # bit-identical to k dispatched steps. Benched through the REAL stacked
    # path (k stacked micro-batches, one transfer), not same_batch.
    # clamp: 0/negative (natural spellings of "disable") must take the
    # single-step path without zeroing the per-step divisor below
    scan_k = max(1, int(os.environ.get("BIFOLD_BENCH_SCAN_K", 8)))
    state = (params, opt_state, {}, jax.random.key(0))
    if scan_k > 1:
        multi = parallel.make_scan_train_step(step, scan_k, donate=True)
        stacked = {k: jnp.broadcast_to(v[None], (scan_k,) + v.shape)
                   for k, v in device_batch.items()}
        run, n_dispatch, run_batch = multi, max(2, -(-steps // scan_k)), stacked
    else:
        run, n_dispatch, run_batch = step, steps, device_batch
    for i in range(warmup):
        state, metrics = run(state, run_batch)
    float(metrics["loss"])  # host readback = true synchronization barrier
    t0 = time.time()
    for i in range(n_dispatch):
        state, metrics = run(state, run_batch)
    loss = float(metrics["loss"])  # block_until_ready alone can return early
    dt = (time.time() - t0) / (n_dispatch * scan_k)  # per-step, tunneled

    # XLA's own FLOP count for the compiled step -> MFU accounting
    # (VERDICT r2: the "roofline-bound" claim must be checkable). lower()
    # only traces/compiles — no execution, donation not triggered.
    def count_flops(fn):
        try:
            ca = fn.lower(state, device_batch).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0)) or None
        except Exception:  # noqa: BLE001 - cost analysis is best-effort
            return None

    flops = count_flops(step)

    # compiled peak HBM of the SHIPPED dispatch program (the k-step scan
    # when scan_k>1) — XLA's own buffer-assignment peak, so memory
    # regressions (remat/batch/layout changes) show up in the driver
    # artifact (VERDICT r4 weak #6; definitions in BENCH_NOTES.md).
    # lower().compile() hits the same executable cache the timed loop used.
    mem = {}
    try:
        ma = run.lower(state, run_batch).compile().memory_analysis()
        if isinstance(ma, (list, tuple)):
            ma = ma[0]
        mem = {
            "train_peak_hbm_bytes": int(ma.peak_memory_in_bytes),
            "train_args_bytes": int(ma.argument_size_in_bytes),
            "train_temp_bytes": int(ma.temp_size_in_bytes),
        }
    except Exception:  # noqa: BLE001 - best-effort introspection
        pass
    # the flash kernels are opaque custom-calls XLA counts as 0 flops; add
    # their architecture FLOPs analytically (unpadded shapes, 2 flops/MAC;
    # fwd = qk + pv, fused bwd = s-recompute + dp + dv + dk + dq = 5
    # matmuls). The flagship's attention sites: depth-8 fusion over the
    # [text 64 | (ctx+1)x577] sequence at h=16 d=48, and 12 tower layers
    # over (ctx+1)*batch frames of 577 tokens at h=12 d=64 (text tower runs
    # the XLA path and is already inside `flops`). Definitions in
    # BENCH_NOTES.md. (Compiling the XLA-attention variant for comparison
    # dies in the remote compiler at these shapes — the materialized
    # (b, h, 2373, 2373) scores are exactly what flash exists to avoid.)
    def attn_flops(b, h, n, d, layers):
        return 14 * b * h * n * n * d * layers

    context = 3
    # fusion sequence = 65 text-side tokens + (ctx+1) frames x 577 patches
    flops_flash = (attn_flops(batch, 16, 65 + (context + 1) * 577, 48, 8)
                   + attn_flops(batch * (context + 1), 12, 577, 64, 12))
    flops_total = (flops + flops_flash) if flops else None
    return batch / dt, dt, loss, flops, flops_total, mem


def bench_latency(image_size: int = 384, iters: int = 30):
    """Batch-1 raw-pixels+text -> Action, p50 over iters, through the REAL
    serving path (ServingModel.predict: preprocessing + forward + decode as
    exactly one device dispatch — the BASELINE.md <20 ms target)."""
    import jax
    import jax.numpy as jnp

    from bifold_tpu.data.processor import Processor
    from bifold_tpu.models import build_model
    from bifold_tpu.serving import ServingModel

    model = build_model({
        "name": "siglip", "image_size": image_size, "is_bimanual": True,
        "patch_size": 16, "automodel_name": "siglip-base", "dim": 768,
        "lora": False, "depth": 8, "heads": 16,
    }, dtype=jnp.bfloat16)
    from bifold_tpu.data.tokenizers import ensure_spm_fixture
    ensure_spm_fixture()  # exact Viterbi tokenization, never hash fallback
    proc = Processor(
        {"model_image_size": image_size, "text_encoder": None, "sigma": 5,
         "requires_graph": False, "spatial_augment": False, "strategy": "gmm",
         "mask_depth": True, "standardize_depth": False},
        partition="test", autoprocessor_name="siglip")

    rng = np.random.default_rng(0)
    s = image_size
    init_sample = {
        "rgb": jnp.asarray(rng.standard_normal((1, 3, s, s)), jnp.float32),
        "instruction": jnp.asarray(rng.integers(0, 30000, (1, 64)), jnp.int32),
        "mask": jnp.asarray((rng.random((1, 1, s, s)) > 0.5), jnp.float32),
    }
    variables = jax.jit(
        lambda k: model.init(k, init_sample, deterministic=True))(jax.random.key(0))
    # float16 depth wire: depth dominates the upload and the tunnel moves
    # ~25 MB/s, so halving its bytes is ~6 ms off the observation floor
    server = ServingModel(model, variables, proc, threshold=0.01,
                          depth_wire_dtype="float16")

    rgb = rng.integers(0, 255, (s, s, 3), dtype=np.uint8)
    depth = rng.random((s, s)).astype(np.float32)
    mask = (rng.random((s, s)) > 0.5).astype(np.float32)
    instruction = "fold the towel from left to right"
    server.predict(rgb=rgb, depth=depth, mask=mask, instruction=instruction)
    times = []
    for _ in range(iters):
        t0 = time.time()
        server.predict(rgb=rgb, depth=depth, mask=mask, instruction=instruction)
        times.append(time.time() - t0)
    p50 = float(np.median(times) * 1e3)

    # MEASURED on-chip serve time (VERDICT r2 weak #1): trace N predicts,
    # interval-merge the device plane's op events (no nested double-count)
    # and divide — an actual device-busy measurement, not the null-program
    # subtraction estimate (still reported alongside for the tunnel view).
    onchip_ms = None
    try:
        import shutil
        import sys as _sys
        _sys.path.insert(0, str(ROOT / "tools"))
        from xplane import device_busy_ms
        prof_iters = 10
        shutil.rmtree("/tmp/bench_serve_prof", ignore_errors=True)
        jax.profiler.start_trace("/tmp/bench_serve_prof")
        for _ in range(prof_iters):
            server.predict(rgb=rgb, depth=depth, mask=mask,
                           instruction=instruction)
        jax.profiler.stop_trace()
        onchip_ms = device_busy_ms("/tmp/bench_serve_prof") / prof_iters
    except Exception:  # noqa: BLE001 - profiler is best-effort off-TPU
        pass

    # tunnel floor: uploading the same observation bytes into a null program
    # and fetching a scalar — everything above this is on-chip serve compute
    n_bytes = rgb.size + mask.size + 2 * depth.size + 4 * 64
    flat = np.zeros(n_bytes, np.uint8)
    null = jax.jit(lambda x: x[:1].astype(jnp.float32).sum())
    float(null(flat))
    floor = []
    for _ in range(iters):
        t0 = time.time()
        float(null(flat))
        floor.append(time.time() - t0)
    floor_ms = float(np.median(floor) * 1e3)

    # memory footprint of the serving stack (VERDICT r4 weak #6): compiled
    # peak HBM of the one-dispatch serve program + weight bytes under the
    # three storage options (f32 masters / shipped bf16 precast / int8).
    # int8 sizes come from eval_shape over the REAL quantizer (its own
    # per-leaf inclusion rules), no device work.
    def _tree_bytes(tree):
        return int(sum(np.prod(x.shape) * x.dtype.itemsize if hasattr(x, "shape")
                       else np.asarray(x).nbytes
                       for x in jax.tree_util.tree_leaves(tree)))

    mem = {}
    try:
        ma = server.program_memory(rgb=rgb, depth=depth, mask=mask,
                                   instruction=instruction)
        if ma is not None:
            mem["serve_peak_hbm_bytes"] = int(ma.peak_memory_in_bytes)
        from bifold_tpu.serving import quantize_weights
        mem["serve_weights_bytes_f32"] = _tree_bytes(variables)
        mem["serve_weights_bytes_precast"] = _tree_bytes(server.variables)
        mem["serve_weights_bytes_int8"] = _tree_bytes(
            jax.eval_shape(quantize_weights, variables))
    except Exception:  # noqa: BLE001 - best-effort introspection
        pass
    return p50, floor_ms, n_bytes, onchip_ms, mem


def _arm_watchdog(seconds: float, what: str):
    """Fail fast instead of hanging forever when the tunneled TPU runtime is
    unreachable: jax.devices() blocks in C retrying the connection (observed
    during the 2026-08-17 axon outage), so no Python exception ever reaches
    the error-JSON handler below. A daemon thread prints the contract JSON
    line and hard-exits if the guarded phase doesn't finish in time."""
    import os
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(seconds):
            print(json.dumps({
                "metric": "train_samples_per_sec_per_chip",
                "value": None, "unit": "samples/s/chip", "vs_baseline": None,
                "error": (f"watchdog: {what} did not complete within "
                          f"{seconds:.0f}s — TPU runtime unreachable "
                          "(tunnel outage?)"),
            }), flush=True)
            os._exit(1)

    threading.Thread(target=watch, daemon=True).start()
    return done


def main():
    import jax

    # persistent compile cache: the flagship program is large and the first
    # TPU compile is minutes; subsequent bench runs (e.g. the driver's) reuse it
    jax.config.update("jax_compilation_cache_dir",
                      str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    connected = _arm_watchdog(180.0, "TPU runtime initialization")
    devices = jax.devices()
    connected.set()
    platform = devices[0].platform
    n_chips = len(devices)

    baseline_path = ROOT / "BENCH_BASELINE.json"
    baseline = None
    if baseline_path.exists():
        baseline = json.loads(baseline_path.read_text()).get(
            "torch_cpu_train_samples_per_sec")

    # batch 2 = the reference's training batch size (conf/config.yaml:12);
    # overridable for scaling studies. A fixed batch keeps driver runs on the
    # warm compile cache (no OOM-probe recompiles).
    import os
    batch = int(os.environ.get("BIFOLD_BENCH_BATCH", 2))
    throughput = step_time = loss = flops = flops_total = None
    train_mem = {}
    while batch >= 1:
        try:
            (throughput, step_time, loss, flops, flops_total,
             train_mem) = bench_train(batch)
            break
        except Exception as e:  # noqa: BLE001 - retry smaller on OOM
            if "RESOURCE_EXHAUSTED" in str(e) or "out of memory" in str(e).lower():
                last_oom = e
                batch //= 2
                continue
            raise
    if throughput is None:
        # batch 1 still OOMed: surface the real cause, not a TypeError
        # from the division below
        raise last_oom
    per_chip = throughput / n_chips

    serve_mem = {}
    try:
        (p50_ms, tunnel_floor_ms, obs_bytes, onchip_measured_ms,
         serve_mem) = bench_latency()
    except Exception:  # noqa: BLE001
        p50_ms = tunnel_floor_ms = obs_bytes = onchip_measured_ms = None

    # the axon runtime tunnels to a remote chip: a trivial dispatch+readback
    # costs ~30 ms RTT, which dominates batch-1 latency measurements. Report
    # the RTT and the RTT-corrected on-chip estimate alongside the raw p50.
    rtt_ms = None
    try:
        f = jax.jit(lambda x: x + 1.0)
        x = jax.numpy.zeros(())
        float(f(x))
        samples = []
        for _ in range(20):
            t0 = time.time()
            float(f(x))
            samples.append(time.time() - t0)
        rtt_ms = float(np.median(samples) * 1e3)
    except Exception:  # noqa: BLE001
        pass

    print(json.dumps({
        "metric": "train_samples_per_sec_per_chip",
        "value": round(per_chip, 3),
        "unit": "samples/s/chip",
        "vs_baseline": round(per_chip / baseline, 3) if baseline else None,
        "platform": platform,
        "n_chips": n_chips,
        "batch": batch,
        "step_time_s": round(step_time, 5),
        "loss": round(loss, 4),
        # MFU vs the chip's bf16 matmul peak (v5e: 197 TFLOPS/chip), from
        # XLA's count plus the analytic flash-attention FLOPs (the custom-
        # calls are opaque to cost_analysis — definitions in BENCH_NOTES.md)
        "flops_per_step": flops,
        "flops_per_step_with_attention": flops_total,
        "tflops_sustained": (round((flops_total or flops) / step_time / 1e12, 2)
                             if (flops_total or flops) and step_time else None),
        "mfu_bf16_peak": (round((flops_total or flops) / step_time / 197e12, 4)
                          if (flops_total or flops) and step_time
                          and platform in ("tpu", "axon") else None),
        "batch1_p50_ms": round(p50_ms, 3) if p50_ms is not None else None,
        # profiler-MEASURED device busy time per serve call (the BASELINE
        # <20 ms target's accountable number; see CLAUDE.md serving notes)
        "batch1_p50_onchip_measured_ms": (round(onchip_measured_ms, 3)
                                          if onchip_measured_ms is not None
                                          else None),
        "dispatch_rtt_ms": round(rtt_ms, 3) if rtt_ms is not None else None,
        # observation upload + dispatch + fetch of a null program on the same
        # bytes: the tunnel's floor for ANY serve call with this observation
        "tunnel_floor_ms": (round(tunnel_floor_ms, 3)
                            if tunnel_floor_ms is not None else None),
        "observation_bytes": obs_bytes,
        "batch1_p50_onchip_est_ms": (round(max(p50_ms - tunnel_floor_ms, 0.0), 3)
                                     if p50_ms is not None
                                     and tunnel_floor_ms is not None
                                     else None),
        "baseline_torch_cpu_samples_per_sec": baseline,
        # compiled peak HBM (XLA buffer assignment) of the shipped train
        # dispatch + the one-dispatch serve program, and serving weight
        # bytes per storage option — definitions in BENCH_NOTES.md
        **train_mem,
        **serve_mem,
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 - the driver needs its JSON line
        print(json.dumps({
            "metric": "train_samples_per_sec_per_chip",
            "value": None, "unit": "samples/s/chip", "vs_baseline": None,
            "error": f"{type(e).__name__}: {str(e)[:300]}",
        }))
        raise SystemExit(1)

"""Rollout-inference batching microbench on the real TPU.

Quantifies what the lockstep parallel evaluators
(env/softgym_evaluator.py SoftgymParallelEvaluator,
env/bimanual_evaluator.py SoftgymBimanualParallelEvaluator) buy: batch-1
closed-loop inference is dominated by per-call dispatch + transfer latency
(bench.py measures a ~30 ms dispatch RTT and ~39 ms upload floor over the
tunneled runtime vs ~4.5 ms on-chip compute), so serving K lockstep trials
from ONE batched forward+decode amortizes the fixed cost K-fold.

Times the flagship model's eval path (forward + jitted decode_action — the
exact Trainer.get_action program the evaluator policies call) at batch
K in {1, 2, 4, 8}, wall-clock per call over the tunnel, honest host
readback as the sync barrier. Reports per-call and per-sample times.

Usage: python tools/rollout_bench.py [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCHES = (1, 2, 4, 8)


def _observations(n: int, image_size: int = 384, context: int = 3):
    rng = np.random.default_rng(0)
    obs = []
    for _ in range(n):
        ctx = [dict(rgb=rng.integers(0, 255, (image_size, image_size, 3),
                                     dtype=np.uint8),
                    depth=rng.random((image_size, image_size),
                                     dtype=np.float32),
                    mask=np.ones((image_size, image_size), np.float32))
               for _ in range(context)]
        obs.append(dict(
            rgb=rng.integers(0, 255, (image_size, image_size, 3),
                             dtype=np.uint8),
            depth=rng.random((image_size, image_size), dtype=np.float32),
            mask=(rng.random((image_size, image_size)) > 0.5).astype(
                np.float32),
            instruction="fold the cloth in half, left to right",
            context=ctx))
    return obs


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    sys.path.insert(0, str(ROOT))
    import bench

    from bifold_tpu import parallel
    from bifold_tpu.models import decode_action
    from bifold_tpu.serving import ServingModel

    model, proc, raw, device_batch, params, _opt, _step = bench._flagship(
        batch=max(BATCHES))
    eval_step = parallel.make_eval_step(model)
    decode = jax.jit(lambda out, b: decode_action(
        out, b, is_bimanual=True, threshold=float(model.threshold)))

    # --- path A: the default get_action policy — host-processed f32 sample
    # upload + forward + decode (what the evaluators send without
    # eval_serving_policy) ---------------------------------------------------
    host_batch = {k: np.asarray(v) for k, v in device_batch.items()}
    results = {}
    for k in BATCHES:
        bk = {key: v[:k] for key, v in host_batch.items()}

        def call():
            db = {key: jnp.asarray(v) for key, v in bk.items()}
            out = eval_step(params, {}, db)
            dec = decode(out, db)
            # host readback of every decoded pixel = the evaluator's real
            # consumption pattern AND the only honest sync over the tunnel
            return {kk: np.asarray(vv) for kk, vv in dec.items()}

        call()  # compile
        times = []
        for _ in range(reps):
            t0 = time.time()
            call()
            times.append(time.time() - t0)
        p50 = float(np.median(times)) * 1e3
        results[k] = p50
        print(f"get_action  batch {k}: p50 {p50:8.2f} ms/call  "
              f"{p50 / k:7.2f} ms/sample")

    # --- path B: ServingPolicy — packed uint8/f16 observation wire,
    # preprocessing on device, one dispatch (eval_serving_policy=true) -------
    from bifold_tpu.data.processor import Processor
    sproc = Processor(
        {"model_image_size": 384, "text_encoder": None, "sigma": 5,
         "requires_graph": False, "spatial_augment": False, "strategy": "gmm",
         "mask_depth": True, "standardize_depth": False},
        partition="test", max_context_length=3, autoprocessor_name="siglip")
    # BIFOLD_ROLLOUT_INT8=1: the weight-only int8 serving arm (expected a
    # footprint lever, not a latency one — measure to confirm)
    import os
    quantize = "int8" if os.environ.get("BIFOLD_ROLLOUT_INT8", "") \
        not in ("", "0") else None
    server = ServingModel(model, {"params": params}, sproc,
                          depth_wire_dtype="float16", quantize=quantize)
    sresults = {}
    for k in BATCHES:
        obs = _observations(k)
        server.predict_batch(obs)  # compile
        times = []
        for _ in range(reps):
            t0 = time.time()
            server.predict_batch(obs)
            times.append(time.time() - t0)
        p50 = float(np.median(times)) * 1e3
        sresults[k] = p50
        print(f"serving     batch {k}: p50 {p50:8.2f} ms/call  "
              f"{p50 / k:7.2f} ms/sample")

    kmax = max(BATCHES)
    print(f"per-sample amortization at batch {kmax}: "
          f"get_action {results[1] / (results[kmax] / kmax):.1f}x, "
          f"serving {sresults[1] / (sresults[kmax] / kmax):.1f}x; "
          f"serving vs get_action at batch {kmax}: "
          f"{results[kmax] / sresults[kmax]:.1f}x")


if __name__ == "__main__":
    main()

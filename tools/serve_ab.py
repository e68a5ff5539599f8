"""One-off serving dtype A/B on the real chip: f32 vs bf16 vs int8-weight
forward.

VERDICT r2 next #1 asks the batch-1 serving target to come with a measured
f32-vs-quantized A/B. The shipped serve path runs the model in bfloat16 (the
quantized side); this measures both dtypes with the profiler-based device
busy time (tools/xplane.py) and prints one JSON line.

Usage: python tools/serve_ab.py
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

import numpy as np


def measure(dtype_name: str, image_size: int = 384, prof_iters: int = 10):
    import jax
    import jax.numpy as jnp

    from bifold_tpu.data.processor import Processor
    from bifold_tpu.models import build_model
    from bifold_tpu.serving import ServingModel
    from xplane import device_busy_ms

    # "int8" = weight-only int8 quantization over the bf16 compute path
    # (dequant inside the serve program) — halves weight HBM reads
    quantize = "int8" if dtype_name == "int8" else None
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
             "int8": jnp.bfloat16}[dtype_name]
    model = build_model({
        "name": "siglip", "image_size": image_size, "is_bimanual": True,
        "patch_size": 16, "automodel_name": "siglip-base", "dim": 768,
        "lora": False, "depth": 8, "heads": 16,
    }, dtype=dtype)
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
    server = ServingModel(model, variables, proc, threshold=0.01,
                          depth_wire_dtype="float16", quantize=quantize)
    rgb = rng.integers(0, 255, (s, s, 3), dtype=np.uint8)
    depth = rng.random((s, s)).astype(np.float32)
    mask = (rng.random((s, s)) > 0.5).astype(np.float32)
    instr = "fold the towel from left to right"
    server.predict(rgb=rgb, depth=depth, mask=mask, instruction=instr)

    times = []
    for _ in range(20):
        t0 = time.time()
        server.predict(rgb=rgb, depth=depth, mask=mask, instruction=instr)
        times.append(time.time() - t0)
    p50 = float(np.median(times) * 1e3)

    trace_dir = f"/tmp/serve_ab_{dtype_name}"
    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    for _ in range(prof_iters):
        server.predict(rgb=rgb, depth=depth, mask=mask, instruction=instr)
    jax.profiler.stop_trace()
    onchip = device_busy_ms(trace_dir) / prof_iters
    return p50, onchip


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    out = {}
    for dtype_name in ("bfloat16", "float32", "int8"):
        p50, onchip = measure(dtype_name)
        out[dtype_name] = {"p50_ms": round(p50, 2),
                           "onchip_measured_ms": round(onchip, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

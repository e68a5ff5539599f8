"""Deployment-daemon validation on the real TPU at flagship geometry.

The HTTP daemon (bifold_tpu/serve.py) was built and soaked while the axon
tunnel was down, so its test evidence is CPU-only. This stands the same
ThreadingHTTPServer + ServingModel stack up against the real chip (flagship
384-px SigLIP geometry, random weights, compile-cache reuse from bench.py's
serve program) and reports:

  - sequential /predict p50/p95 wall latency over HTTP (localhost), and
  - a concurrent burst through the dynamic batcher (max_batch=4) with the
    coalescing counters, verifying every client gets its own row.

Usage: python tools/daemon_tpu_check.py [n_sequential]
"""

from __future__ import annotations

import io
import json
import sys
import threading
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import numpy as np


def main():
    import http.client

    import jax
    import jax.numpy as jnp

    from bifold_tpu.data.processor import Processor
    from bifold_tpu.models import build_model
    from bifold_tpu.serve import make_httpd
    from bifold_tpu.serving import ServingModel

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n_seq = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    s = 384
    model = build_model({
        "name": "siglip", "image_size": s, "is_bimanual": True,
        "patch_size": 16, "automodel_name": "siglip-base", "dim": 768,
        "lora": False, "depth": 8, "heads": 16,
    }, dtype=jnp.bfloat16)
    proc = Processor(
        {"model_image_size": s, "text_encoder": None, "sigma": 5,
         "requires_graph": False, "spatial_augment": False,
         "strategy": "gmm", "mask_depth": True,
         "standardize_depth": False},
        partition="test", autoprocessor_name="siglip")
    rng = np.random.default_rng(0)
    init_sample = {
        "rgb": jnp.asarray(rng.standard_normal((1, 3, s, s)), jnp.float32),
        "instruction": jnp.asarray(rng.integers(0, 30000, (1, 64)),
                                   jnp.int32),
        "mask": jnp.asarray((rng.random((1, 1, s, s)) > 0.5), jnp.float32),
    }
    variables = jax.jit(
        lambda k: model.init(k, init_sample, deterministic=True))(
            jax.random.key(0))
    server = ServingModel(model, variables, proc, threshold=0.01,
                          depth_wire_dtype="float16")
    httpd = make_httpd(server, max_batch=4, batch_window_ms=8.0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def payload(i):
        r = np.random.default_rng(i)
        buf = io.BytesIO()
        np.savez(buf,
                 rgb=r.integers(0, 255, (s, s, 3), dtype=np.uint8),
                 depth=r.random((s, s)).astype(np.float32),
                 mask=(r.random((s, s)) > 0.5).astype(np.float32),
                 instruction=np.asarray(f"fold the towel {i}"))
        return buf.getvalue()

    def post(body):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/predict", body=body)
        r = conn.getresponse()
        data = r.read()
        conn.close()
        if r.status != 200:
            raise RuntimeError(f"HTTP {r.status}: {data[:300]!r}")
        return dict(np.load(io.BytesIO(data)))

    post(payload(0))  # warm batch-1
    # warm the batcher's padded pool program before the burst
    server.predict_batch(
        [dict(rgb=np.zeros((s, s, 3), np.uint8),
              depth=np.zeros((s, s), np.float32),
              mask=np.ones((s, s), np.float32), instruction="warm")],
        pad_to=4)

    times = []
    body = payload(1)
    for _ in range(n_seq):
        t0 = time.time()
        post(body)
        times.append((time.time() - t0) * 1e3)

    # concurrent burst through the dynamic batcher
    n_burst = 8
    results = [None] * n_burst
    bodies = [payload(100 + i) for i in range(n_burst)]

    errors = [None] * n_burst

    def call(i):
        try:
            results[i] = post(bodies[i])
        except Exception as e:  # surfaced after join, not swallowed
            errors[i] = repr(e)

    batcher = httpd.batcher
    before = (batcher.requests, batcher.batches)
    t0 = time.time()
    threads = [threading.Thread(target=call, args=(i,))
               for i in range(n_burst)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    burst_ms = (time.time() - t0) * 1e3
    field = server._action_fields()[0]
    for i, r in enumerate(results):
        assert r is not None and field in r, \
            f"burst row {i} failed: {errors[i]} keys={list(r or {})}"
    # rows must be client-specific: identical inputs are not sent, so no
    # two rows should be byte-identical
    picks = {tuple(np.asarray(r[field]).ravel().tolist())
             for r in results}
    after = (batcher.requests, batcher.batches)

    out = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "seq_p50_ms": float(np.percentile(times, 50)),
        "seq_p95_ms": float(np.percentile(times, 95)),
        "burst_n": n_burst,
        "burst_wall_ms": burst_ms,
        "burst_ms_per_req": burst_ms / n_burst,
        "distinct_picks": len(picks),
        "burst_requests": after[0] - before[0],
        "burst_dispatches": after[1] - before[1],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

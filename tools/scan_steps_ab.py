"""A/B: per-dispatch train-step program vs k steps fused into one lax.scan
program ("steps_per_dispatch").

The round-3 profile shows the flagship step at ~81 ms device-busy vs
~84.6 ms wall per step with 10 queued dispatches — i.e. ~3.5 ms/step of
per-program launch overhead that queueing does not hide on this runtime.
Fusing k steps into one dispatched program (lax.scan over the step body,
state as carry) amortizes that launch cost k-ways. This is the standard TPU
"host loop off the critical path" idiom (cf. t5x/pax multi-step train
programs); the reference has no equivalent (single-GPU torch loop,
SURVEY.md §3.1).

Usage:  python tools/scan_steps_ab.py [k ...]   (default: 1 4 8)

Prints per-arm mean wall ms/step (host scalar readback as the sync
barrier, same methodology as bench.py) so arms are directly comparable.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 8]

    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench

    (model, proc, raw, device_batch, params, opt_state,
     step) = bench._flagship(2)

    from bifold_tpu import parallel

    results = {}
    for i, k in enumerate(ks):
        if k == 1:
            fn, n_dispatch = step, 10
        else:
            fn = parallel.make_scan_train_step(step, k, same_batch=True)
            n_dispatch = max(2, 16 // k)
        state = (params, opt_state, {}, jax.random.key(0))
        # warmup (compile + settle)
        for _ in range(2):
            state, metrics = fn(state, device_batch)
        float(metrics["loss"])
        t0 = time.time()
        for _ in range(n_dispatch):
            state, metrics = fn(state, device_batch)
        loss = float(metrics["loss"])  # readback = true sync barrier
        dt_ms = (time.time() - t0) / (n_dispatch * k) * 1e3
        results[k] = dt_ms
        print(f"k={k:2d}: {dt_ms:7.2f} ms/step "
              f"({2.0 / (dt_ms / 1e3):.2f} samples/s, loss {loss:.4f}, "
              f"{n_dispatch} dispatches)", flush=True)
        # state buffers were donated into fn; rebuild fresh state for the
        # next arm (skip after the last — the jitted init costs minutes
        # over the tunnel).
        if i + 1 < len(ks):
            (model, proc, raw, device_batch, params, opt_state,
             step) = bench._flagship(2)

    base = results.get(1)
    if base:
        for k, v in results.items():
            if k != 1:
                print(f"k={k}: {(base - v) / base * 100:+.1f}% vs k=1")


if __name__ == "__main__":
    main()

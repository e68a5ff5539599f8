"""Profile the flagship train step on the real TPU and print a cost table.

Uses the raw-xplane recipe from CLAUDE.md (tensorboard_plugin_profile's
converters are version-broken on this machine, but parsing the xplane proto
works). Aggregates device-plane event durations by op-name prefix; nested
while/attention rows double-count, so group totals are indicative — compare
groups to each other and across runs, not to wall-clock.

Usage: python tools/profile_step.py [steps] [scan_k]

scan_k defaults to the shipped steps_per_dispatch (8): the trace then covers
the REAL benched program (k stacked micro-steps in one lax.scan dispatch),
and every per-step figure divides by steps*scan_k. Pass scan_k=1 for the
raw single-step program.
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict
from glob import glob
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax


def main():
    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    scan_k = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    sys.path.insert(0, str(ROOT))
    import bench
    import jax.numpy as jnp

    from bifold_tpu import parallel

    (model, proc, raw, device_batch, params, opt_state,
     step) = bench._flagship(batch=2)
    state = (params, opt_state, {}, jax.random.key(0))
    if scan_k > 1:
        run = parallel.make_scan_train_step(step, scan_k, donate=True)
        run_batch = {k: jnp.broadcast_to(v[None], (scan_k,) + v.shape)
                     for k, v in device_batch.items()}
    else:
        run, run_batch = step, device_batch
    micro_steps = steps * scan_k
    for _ in range(2):
        state, metrics = run(state, run_batch)
    float(metrics["loss"])

    import shutil
    shutil.rmtree("/tmp/prof", ignore_errors=True)
    jax.profiler.start_trace("/tmp/prof")
    for _ in range(steps):
        state, metrics = run(state, run_batch)
    float(metrics["loss"])
    jax.profiler.stop_trace()

    sys.path.insert(0, str(ROOT / "tools"))
    from xplane import device_busy_ms

    print(f"== interval-merged device busy: "
          f"{device_busy_ms('/tmp/prof') / micro_steps:.1f} ms/step "
          f"(scan_k={scan_k}; honest wall; the per-op rows below "
          f"double-count nesting)")

    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    path = sorted(glob("/tmp/prof/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())

    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1

        # top copy/transpose ops get their own listing (fixed glue cost)
        copies = {n: ms for n, ms in totals.items()
                  if "copy" in n or "transpose" in n}
        print("-- top copy/transpose ops")
        for name, ms in sorted(copies.items(), key=lambda kv: -kv[1])[:12]:
            print(f"{ms:9.3f} ms  x{counts[name]:<5d} {name[:110]}")

        # group by coarse kind
        groups = defaultdict(float)
        for name, ms in totals.items():
            if "dqkv" in name or "_dq_kernel" in name or "_dkv" in name:
                g = "flash_bwd"
            elif "_fwd_kernel" in name or "flash" in name:
                g = "flash_fwd"
            elif re.search(r"fusion|dot|conv", name):
                g = ("conv" if "conv" in name else "matmul_fusion")
            elif "copy" in name or "transpose" in name:
                g = "copy/transpose"
            elif "while" in name:
                g = "while(outer, double-counts)"
            else:
                g = "other"
            groups[g] += ms

        print(f"== plane {plane.name}: top ops over {micro_steps} "
              f"micro-steps (ms total)")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:28]:
            print(f"{ms:9.3f} ms  x{counts[name]:<5d} {name[:100]}")
        print("-- groups (indicative; nested rows double-count)")
        for g, ms in sorted(groups.items(), key=lambda kv: -kv[1]):
            print(f"{ms:9.3f} ms  {g}")


if __name__ == "__main__":
    main()

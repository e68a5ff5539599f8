"""Mesh-layout advisor CLI — compile the sharded train step for candidate
layouts on a virtual device mesh and rank them by compiled traffic.

Runs entirely without TPU hardware: forces an ``--devices``-way CPU host
platform (any count — compile-only), routes attention through the real
flash custom_partitioning (interpret mode), and prints one report per
layout plus a ranked summary. See bifold_tpu/parallel/advisor.py.

Usage:
  python tools/scale_report.py "dp=8" "dp=2,fsdp=2,tp=2" "dp=2,fsdp=4" \
      [--devices 8] [--batch 8] [--tiny] [--unroll] [--json]

Layout syntax: comma-separated axis=size pairs; one axis may be -1
(inferred). Axes: dp fsdp tp (the train step's mesh).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def parse_layout(text: str) -> dict:
    out = {}
    for part in text.replace(";", ",").split(","):
        part = part.strip()
        if not part:
            continue
        k, _, v = part.partition("=")
        out[k.strip()] = int(v)
    if not out:
        raise SystemExit(f"empty layout spec: {text!r}")
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("layouts", nargs="+", help='e.g. "dp=2,fsdp=2,tp=2"')
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model geometry (fast; for smoke/CI)")
    ap.add_argument("--unroll", action="store_true",
                    help="unroll scan stacks so FLOPs are exact (slower)")
    ap.add_argument("--json", action="store_true", dest="as_json")
    args = ap.parse_args()

    layouts = [parse_layout(t) for t in args.layouts]

    # force the virtual host platform BEFORE the first jax import
    flag = f"--xla_force_host_platform_device_count={args.devices}"
    prev = [f for f in os.environ.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f]
    os.environ["XLA_FLAGS"] = " ".join(prev + [flag])
    import jax

    # compile-only analysis: always run on the virtual CPU host platform
    # (must be set before any backend query; the axon sitecustomize ignores
    # the JAX_PLATFORMS env var)
    jax.config.update("jax_platforms", "cpu")

    from bifold_tpu.parallel.advisor import _TINY_MODEL, scale_report

    kw = dict(batch=args.batch, unroll=args.unroll)
    if args.tiny:
        kw["model_cfg"] = _TINY_MODEL
    reports = scale_report(layouts, **kw)

    if args.as_json:
        print(json.dumps(reports))
        return
    gib = 1 << 30
    for r in reports:
        if "error" in r:
            print(f"\n== mesh {r['mesh']} == FAILED TO COMPILE:\n  {r['error']}")
            continue
        est = r["est"]
        print(f"\n== mesh {r['mesh']}  ({r['n_devices']} devices, global "
              f"batch {r['batch_global']}) ==")
        print(f"  params/device {r['param_bytes_per_device'] / gib:.3f} GiB"
              f"  opt-state/device "
              f"{r['opt_state_bytes_per_device'] / gib:.3f} GiB")
        exact = "" if r["flops_exact"] else " (rolled-scan undercount)"
        print(f"  flops/device {r['flops_per_device'] / 1e12:.2f} TF{exact}"
              f"  hbm/device {r['hbm_bytes_per_device'] / gib:.2f} GiB")
        for kind, agg in sorted(r["collectives"].items()):
            print(f"  {kind:<19} x{agg['count']:<4} wire "
                  f"{agg['wire_bytes'] / (1 << 20):,.1f} MiB/device")
        print(f"  roofline ({r['chip']}): compute {est['compute_ms']:.2f} ms"
              f" | hbm {est['hbm_ms']:.2f} ms | ici {est['ici_ms']:.2f} ms"
              f" -> >= {est['step_ms_lower_bound']:.2f} ms/step,"
              f" {est['bottleneck']}-bound")
    print("\nranking (roofline lower bound, best first):")
    for i, r in enumerate(reports, 1):
        if "error" in r:
            print(f"  {i}. {r['mesh']}  FAILED ({r['error'].splitlines()[0][:80]})")
        else:
            print(f"  {i}. {r['mesh']}  >= {r['est']['step_ms_lower_bound']:.2f}"
                  f" ms/step ({r['est']['bottleneck']})")


if __name__ == "__main__":
    main()

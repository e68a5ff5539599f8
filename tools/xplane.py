"""Raw-xplane trace parsing (tensorboard_plugin_profile's converters are
version-broken on this machine; the proto itself parses fine).

The key helper is :func:`device_busy_ms`: per device plane, per trace line,
events are interval-MERGED before summing, so nested rows (while bodies,
fused attention sub-ops) never double-count. That makes it an honest
"device was executing" wall-time — the measurement VERDICT r2 asked for in
place of the null-program-subtraction estimate for batch-1 serving.
"""

from __future__ import annotations

from collections import defaultdict
from glob import glob


def load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = sorted(glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def _merged_span_ps(events) -> int:
    """Total covered picoseconds of a set of (possibly nested/overlapping)
    events on one trace line."""
    ivals = sorted((ev.offset_ps, ev.offset_ps + ev.duration_ps)
                   for ev in events)
    total = 0
    cur_s = cur_e = None
    for s, e in ivals:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        total += cur_e - cur_s
    return total


def device_busy_ms(trace_dir: str, plane_substr: str = "TPU",
                   line_name: str = "XLA Ops") -> float:
    """Interval-merged device busy time (ms) across all matching planes."""
    xs = load_xspace(trace_dir)
    busy_ps = 0
    for plane in xs.planes:
        if plane_substr not in plane.name:
            continue
        for line in plane.lines:
            if line_name and line.name != line_name:
                continue
            busy_ps += _merged_span_ps(line.events)
    return busy_ps / 1e9


def per_op_totals_ms(trace_dir: str, plane_substr: str = "TPU",
                     line_name: str = "XLA Ops") -> dict[str, float]:
    """Summed per-op durations (ms). Nested rows DO double-count here —
    use for relative ranking, use device_busy_ms for absolute time."""
    xs = load_xspace(trace_dir)
    totals: dict[str, float] = defaultdict(float)
    for plane in xs.planes:
        if plane_substr not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line_name and line.name != line_name:
                continue
            for ev in line.events:
                totals[meta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e9
    return dict(totals)

"""int8 serving decision fidelity on TRAINED full-scale weights (VERDICT r3
item 7): pick/place pixel agreement between int8 and f32 serving at the
shipped geometry, asserted on genuinely non-flat (overfit) heatmaps.

The compute runs in a SUBPROCESS (tools/int8_fullscale_check.py) so it can
use the real TPU chip: the test process is pinned to the virtual CPU mesh by
conftest, and training the flagship at full scale on 1 CPU core would take
hours — on the chip it is ~half a minute plus (cached) compiles. Skips when
no accelerator is reachable (the axon tunnel has outages)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]

pytestmark = pytest.mark.skipif(
    os.environ.get("BIFOLD_FULLSCALE", "") in ("", "0"),
    reason="full-scale int8 decision check needs the real chip and minutes; "
           "opt in with BIFOLD_FULLSCALE=1 (run once per round)")


def test_int8_argmax_agreement_fullscale(tmp_path):
    env = dict(os.environ)
    # undo the conftest CPU pin for the child: let the host's default
    # backend (axon TPU here) register
    env.pop("JAX_PLATFORMS", None)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags)
    out_json = tmp_path / "int8_check.json"
    try:
        proc = subprocess.run(
            [sys.executable, str(ROOT / "tools" / "int8_fullscale_check.py"),
             "--steps", "400", "--json-out", str(out_json)],
            env=env, cwd=ROOT, timeout=2400,
            capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        pytest.skip("accelerator unreachable / compile too slow "
                    "(axon tunnel outage?)")
    assert proc.returncode == 0, proc.stderr[-3000:]
    report = json.loads(out_json.read_text())

    assert report["loss_final"] < 0.2, report["loss_final"]
    for h, e in report["heads"].items():
        # the heatmaps must be decisively non-flat for the argmax claim to
        # mean anything: peak well above the map median and far above the
        # measured int8 sigmoid-space noise (~0.03)
        assert e["margin_vs_median"] > 0.3, (h, e)
        assert e["margin_vs_median"] > 5 * e["int8_sigmoid_maxdelta"], (h, e)
        # the decision: int8 and f32 serving pick the same pixel (<=2 px
        # tolerates sub-pixel peak shifts inside the sigma-5 gaussian)
        assert e["dist_int8_f32_px"] <= 2.0, (h, e)
        assert e["dist_bf16_f32_px"] <= 2.0, (h, e)
    assert report["agree_int8_f32_within_2px"]

"""Driver contract: entry() abstract-evals; dryrun_multichip runs on 8 CPU
devices (the driver's own invocation mode)."""

import jax
import pytest


def test_dryrun_multichip_8(devices, capsys):
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip" in out and "loss=" in out


def test_entry_compiles_abstractly():
    import __graft_entry__ as ge
    fn, (variables, batch) = ge.entry()
    # full-size flagship: abstract eval (no FLOPs) proves jit-traceability
    shapes = jax.eval_shape(fn, variables, batch)
    assert "left_pick_heatmap" in shapes
    assert shapes["left_pick_heatmap"].shape == (1, 384, 384)

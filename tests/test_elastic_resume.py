"""Elastic resume: checkpoints are topology-independent (VERDICT r4 weak #3).

Checkpoints store fully-gathered host arrays (utils/checkpoint.py), so a
run saved under one mesh must resume under ANY other — different axis
layout, different device count, different steps_per_dispatch — with the
same SGD trajectory as the uninterrupted run. One mid-epoch interrupt under
dp=2 x fsdp=2 x tp=2 is resumed three ways and each final param tree is
checked against the straight-through reference (sharded==unsharded
tolerance: reduction orders differ across topologies, so float-order noise
only; the SAME-topology resume is already bitwise-covered by
test_trainer.py::test_midepoch_interrupt_resume_bitwise).
"""

import shutil

import jax
import numpy as np
import pytest

from bifold_tpu import parallel
from bifold_tpu.config import Config, compose
from bifold_tpu.trainer import Trainer


def _cfg(run_dir, mesh=(), spd=1):
    return compose([
        "train_dataset=synthetic", "test_dataset=null", "model=siglip",
        "train_dataset.n_samples=32", "train_dataset.image_size=64",
        "model.image_size=64", "model.automodel_name=tiny", "model.dim=64",
        "model.depth=1", "model.heads=4", "model.r=2",
        "model.lora_dropout=0",            # dropout-free: exact across meshes
        "optim=sgd",                       # Adam amplifies float noise
        "precision.compute_dtype=float32",
        "epochs=2", "eval_epochs=2", "batch_size=8", "test_batch_size=8",
        "simulator=null", f"steps_per_dispatch={spd}",
        f"run_dir={run_dir}", "log_every=1", *mesh,
    ])


MESH_A = ("mesh.dp=2", "mesh.fsdp=2", "mesh.tp=2")


def _train(run_dir, mesh=(), spd=1, interrupt_at=None):
    parallel.set_active_mesh(None)
    trainer = Trainer(Config(_cfg(run_dir, mesh, spd)), run_dir=run_dir)
    trainer.prepare_train()
    if interrupt_at is not None:
        real_step, calls = trainer._train_step, {"n": 0}

        def boom(state, batch):
            calls["n"] += 1
            if calls["n"] == interrupt_at:
                raise KeyboardInterrupt
            return real_step(state, batch)

        trainer._train_step = boom
        with pytest.raises(KeyboardInterrupt):
            trainer.train()
    else:
        trainer.train()
    return trainer


def _assert_same_trajectory(ref, got, what):
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref.params),
            jax.tree_util.tree_leaves_with_path(got.params)):
        a, b = np.asarray(a), np.asarray(b)
        tol = 2e-5 * max(1.0, float(np.abs(a).max()))
        assert np.abs(a - b).max() <= tol, (
            f"{what}: {jax.tree_util.keystr(kp)} max|d|="
            f"{np.abs(a - b).max()} > {tol}")


@pytest.fixture(scope="module")
def reference_and_interrupt(tmp_path_factory):
    base = tmp_path_factory.mktemp("elastic")
    ref = _train(base / "ref", MESH_A)
    assert ref.global_step == 8
    src = base / "int"
    t = _train(src, MESH_A, interrupt_at=6)  # dies entering step 6
    assert t.global_step == 5
    return base, ref, src


def _resume_from_copy(base, src, name, mesh=(), spd=1, devices=None):
    run_dir = base / name
    shutil.copytree(src, run_dir)
    parallel.set_active_mesh(None)
    if devices is not None:
        import unittest.mock
        real = parallel.make_mesh
        with unittest.mock.patch.object(
                parallel, "make_mesh",
                lambda cfg=None, **kw: real(cfg, devices=devices)):
            trainer = Trainer(Config(_cfg(run_dir, mesh, spd)),
                              run_dir=run_dir)
            trainer.prepare_train()
    else:
        trainer = Trainer(Config(_cfg(run_dir, mesh, spd)), run_dir=run_dir)
        trainer.prepare_train()
    assert trainer.global_step == 5, "must resume the interrupt checkpoint"
    trainer.train()
    assert trainer.global_step == 8
    return trainer


def test_resume_under_dp8(reference_and_interrupt):
    base, ref, src = reference_and_interrupt
    got = _resume_from_copy(base, src, "dp8", ("mesh.dp=8",))
    _assert_same_trajectory(ref, got, "dp=2xfsdp=2xtp=2 -> dp=8")


def test_resume_under_single_device(reference_and_interrupt):
    base, ref, src = reference_and_interrupt
    got = _resume_from_copy(base, src, "one", ("mesh.dp=1",),
                            devices=jax.devices()[:1])
    _assert_same_trajectory(ref, got, "dp=2xfsdp=2xtp=2 -> single device")


def test_resume_under_different_steps_per_dispatch(reference_and_interrupt):
    """Same mesh, steps_per_dispatch 1 -> 3 (a non-divisor of the 3
    remaining steps in the interrupted epoch, so the tail grouping engages
    too): k-step scan dispatch is bit-identical stepping, so the trajectory
    matches within the same cross-compile tolerance."""
    base, ref, src = reference_and_interrupt
    got = _resume_from_copy(base, src, "spd3", MESH_A, spd=3)
    _assert_same_trajectory(ref, got, "steps_per_dispatch 1 -> 3")

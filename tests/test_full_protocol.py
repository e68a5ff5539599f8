"""The COMPLETE unimanual eval protocol dispatch: all 5 tasks x 3 regimes
with cache load, oracle rollouts and model rollouts (VERDICT r2 next #10).

Counterpart of the reference protocol (softgym_evaluator.py:161-254 via
__main__.py:248-255: 5 tasks x num_evals x [si, usi, ut]). Uses a cheap
random-pixel policy — this test pins the DISPATCH (every demonstrator's
action tables through both oracle and model execution, per-regime
oracle/model turn selection, CLOTH3D + square cache loading, summary
shape), not policy quality (test_closed_loop_trained covers that).
"""

import numpy as np
import pytest

from bifold_tpu.data.processor import Processor
from bifold_tpu.env.action import Action
from bifold_tpu.env.cloth_env import ClothEnv
from bifold_tpu.env.softgym_evaluator import (
    TASKS,
    SoftgymSingleEvaluator,
    task_to_cloth_type,
)

RES = 64


@pytest.fixture(scope="module")
def cache_dir(tmp_path_factory):
    from bifold_tpu.env.cache_builder import build_cache

    out = tmp_path_factory.mktemp("softgym_cache")
    for cloth_type in sorted(set(task_to_cloth_type.values())):
        build_cache(cloth_type, out, n_configs=1, settle_steps=10)
    return out


def test_all_tasks_all_regimes(cache_dir):
    calls = {"n": 0, "by_task": {}}
    rand = np.random.default_rng(2)

    def policy(batch):
        calls["n"] += 1
        calls["by_task"][ev.task] = calls["by_task"].get(ev.task, 0) + 1
        return Action(pick=rand.uniform(0, RES, (1, 2)),
                      place=rand.uniform(0, RES, (1, 2))), None

    proc = Processor(
        {"model_image_size": RES, "text_encoder": None, "sigma": 3,
         "requires_graph": False, "spatial_augment": False,
         "strategy": "gmm", "mask_depth": True, "standardize_depth": False},
        partition="test", max_context_length=3, autoprocessor_name="siglip")
    ev = SoftgymSingleEvaluator(cache_dir=str(cache_dir), policy=policy,
                                processor=proc, image_size=RES)
    ev.env = ClothEnv(render_dim=RES, native=False, substeps=2, iterations=6)
    ev.K = ev.env.intrinsic_from_fov(RES, RES)
    ev.error_threshold = ev.env.particle_radius * 2

    for task in TASKS:  # the run_softgym_eval dispatch
        ev.evaluate(num_evals=1, task=task, seed=0)
    summary = ev.summary()
    ev.close()

    for task in TASKS:
        # every regime produced per-action metrics for every task
        for regime in ("si", "usi", "ut"):
            assert f"{task} {regime}" in summary, (task, regime)
            assert np.isfinite(summary[f"error {task} {regime}"])
            assert 0.0 <= summary[f"iou {task} {regime}"] <= 100.0
        # and the MODEL path (not just the oracle) actually ran
        assert calls["by_task"].get(task, 0) > 0, (task, calls)
    assert "average_success" in summary
    assert calls["n"] >= 2 * len(TASKS)

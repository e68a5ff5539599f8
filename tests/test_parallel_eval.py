"""SoftgymParallelEvaluator: lockstep multi-env closed-loop eval.

Protocol-parity contract: with the same seeds (np stream for trial params,
global `random` for instruction sampling) and a deterministic policy, the
parallel evaluator's summary() must match SoftgymSingleEvaluator's exactly —
same trials, same instructions, same actions, same metric multisets — while
every policy call arrives as ONE padded pool-size batch.
"""

import random

import numpy as np

from bifold_tpu.data.processor import Processor
from bifold_tpu.env.action import Action
from bifold_tpu.env.cloth_env import ClothEnv
from bifold_tpu.env.softgym_evaluator import (SoftgymParallelEvaluator,
                                              SoftgymSingleEvaluator,
                                              batchify_many)


def _cheap_env():
    return ClothEnv(render_dim=64, native=False, substeps=2, iterations=6)


def _processor():
    return Processor(
        {"model_image_size": 64, "text_encoder": None, "sigma": 5,
         "requires_graph": False, "spatial_augment": False, "strategy": "gmm",
         "mask_depth": True, "standardize_depth": False},
        partition="test", max_context_length=3)


def _centroid_policy(batch_sizes=None):
    """Deterministic per-row policy: pick = mask centroid, place = +2 px.
    Handles any batch size (the sequential path sends batch 1, the parallel
    path a padded pool batch); optionally records the batch sizes seen."""

    def policy(batch):
        masks = np.asarray(batch["mask"])
        if batch_sizes is not None:
            batch_sizes.append(masks.shape[0])
        picks = []
        for m in masks[:, 0]:
            ys, xs = np.nonzero(m > 0)
            if len(xs) == 0:
                ys = xs = np.array([32])
            picks.append([xs.mean(), ys.mean()])
        p = np.array(picks)
        return Action(pick=p, place=p + 2), None

    return policy


def _install_cheap_envs(ev, pool=None):
    for env in getattr(ev, "envs", [ev.env]):
        env.close()
    if pool is None:
        ev.env = _cheap_env()
    else:
        ev.envs = [_cheap_env() for _ in range(pool)]
        ev.env = ev.envs[0]
    ev.K = ev.env.intrinsic_from_fov(64, 64)
    ev.error_threshold = ev.env.particle_radius * 2


def test_parallel_matches_sequential(tmp_path):
    num_evals, pool = 3, 2   # 3 trials over a pool of 2 -> a ragged group

    random.seed(1234)
    seq = SoftgymSingleEvaluator(cache_dir=str(tmp_path),
                                 policy=_centroid_policy(), processor=_processor(),
                                 image_size=64)
    _install_cheap_envs(seq)
    seq.evaluate(num_evals=num_evals, task="CornerFold", seed=0)
    seq_summary = seq.summary()
    seq.close()

    random.seed(1234)
    sizes = []
    par = SoftgymParallelEvaluator(cache_dir=str(tmp_path),
                                   policy=_centroid_policy(sizes),
                                   processor=_processor(), image_size=64,
                                   pool=pool)
    _install_cheap_envs(par, pool=pool)
    par.evaluate(num_evals=num_evals, task="CornerFold", seed=0)
    par_summary = par.summary()
    par.close()

    assert set(par_summary) == set(seq_summary)
    for k, v in seq_summary.items():
        np.testing.assert_allclose(par_summary[k], v, rtol=1e-9, atol=1e-12,
                                   err_msg=k)
    # every policy call was one padded pool-size batch (the exact call count
    # depends on how the shuffled unseen-flag steps align across the group)
    assert sizes and all(s == pool for s in sizes)


def test_batchify_many_pads_and_stacks():
    a = {"x": np.ones((2, 3)), "s": "hello"}
    b = {"x": np.zeros((2, 3)), "s": "world"}
    out = batchify_many([a, b], pad_to=4)
    assert out["x"].shape == (4, 2, 3)
    np.testing.assert_array_equal(out["x"][2], b["x"])  # padded w/ last
    assert out["s"] == ["hello", "world", "world", "world"]

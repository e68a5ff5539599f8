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
                                 image_size=64, visualize_predictions=True,
                                 run_dir=str(tmp_path / "run"))
    _install_cheap_envs(seq)
    seq.evaluate(num_evals=num_evals, task="CornerFold", seed=0)
    seq_summary = seq.summary()
    seq.close()
    # per-model-action rollout artifacts (reference :92-98, :385-395)
    viz_dir = tmp_path / "run" / "eval" / "softgym" / "CornerFold"
    assert sorted((viz_dir / "viz").glob("si_*.png"))
    assert sorted((viz_dir / "particle_pos").glob("*.npy"))

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


def _bimanual_policy(batch_sizes=None, dummy_right=False):
    """Deterministic bimanual policy: left pick = mask centroid, right pick
    = centroid shifted; DUMMY right arm when requested (single-arm path)."""

    def policy(batch):
        masks = np.asarray(batch["mask"])
        if batch_sizes is not None:
            batch_sizes.append(masks.shape[0])
        lp, rp = [], []
        for m in masks[:, 0]:
            ys, xs = np.nonzero(m > 0)
            if len(xs) == 0:
                ys = xs = np.array([32])
            lp.append([xs.mean() - 3, ys.mean()])
            rp.append([xs.mean() + 3, ys.mean()])
        lp, rp = np.array(lp), np.array(rp)
        if dummy_right:
            rp = np.full_like(rp, -1.0)
            return Action(left_pick=lp, left_place=lp + 2,
                          right_pick=rp, right_place=rp), None
        return Action(left_pick=lp, left_place=lp + 2,
                      right_pick=rp, right_place=rp + 2), None

    return policy


def _bimanual_cache(tmp_path, n_samples=3):
    """Fake bimanual.pkl keyed by frame names, built from the procedural
    Tshirt garment cache (left/right pick = sleeves, place = hems)."""
    import pickle

    from bifold_tpu.env.cache_builder import build_cache

    p = build_cache("Tshirt", tmp_path, n_configs=2, settle_steps=10)
    with open(p, "rb") as f:
        data = pickle.load(f)
    names = [f"{i:04d}_Tshirt_f{i}" for i in range(1, n_samples + 1)]
    configs, states, kps = {}, {}, {}
    for i, name in enumerate(names):
        j = i % 2
        kp = data["keypoints"][j]
        configs[name] = data["configs"][j]
        states[name] = data["states"][j]
        kps[name] = {"left_pick_idx": kp[2], "left_place_idx": kp[6],
                     "right_pick_idx": kp[5], "right_place_idx": kp[7]}
    with open(tmp_path / "bimanual.pkl", "wb") as f:
        pickle.dump({"configs": configs, "states": states,
                     "keypoints": kps}, f)
    ctx = ([names[0]] + [f"{names[0]}+{names[1]}"] * (n_samples - 1)
           if n_samples > 1 else [names[0]])
    samples = {"frame_start": names,
               "raw_instruction": [f"fold the tshirt {i}"
                                   for i in range(n_samples)],
               "context": ctx}
    return samples


def test_bimanual_replay_records_metrics(tmp_path):
    """Regression: reset() during oracle/context replay must not clobber the
    task key — metric appends went to self.success[''] and the KeyError was
    misreported upstream as 'cache unavailable' (pixel fallback)."""
    from bifold_tpu.env.bimanual_evaluator import SoftgymBimanualEvaluator

    samples = _bimanual_cache(tmp_path, n_samples=2)
    ev = SoftgymBimanualEvaluator(cache_dir=str(tmp_path),
                                  policy=_bimanual_policy(),
                                  processor=_processor(), image_size=64,
                                  visualize_predictions=True,
                                  run_dir=str(tmp_path / "run"))
    _install_cheap_envs(ev)
    ev.evaluate(samples=samples)
    summary = ev.summary()
    ev.close()
    assert "Tshirt" in summary
    assert "error Tshirt" in summary and summary["error Tshirt"] > 0
    assert len(ev.success["Tshirt"]) == 2
    viz_dir = tmp_path / "run" / "eval" / "softgym" / "Tshirt"
    assert len(list((viz_dir / "viz").glob("*.png"))) == 2


def test_bimanual_single_arm_dispatch(tmp_path):
    """DUMMY right arm demotes to the single-arm primitive (reference
    :519-540) and still records metrics."""
    from bifold_tpu.env.bimanual_evaluator import SoftgymBimanualEvaluator

    samples = _bimanual_cache(tmp_path, n_samples=1)
    ev = SoftgymBimanualEvaluator(cache_dir=str(tmp_path),
                                  policy=_bimanual_policy(dummy_right=True),
                                  processor=_processor(), image_size=64)
    _install_cheap_envs(ev)
    ev.evaluate(samples=samples)
    assert len(ev.success["Tshirt"]) == 1
    ev.close()


def test_bimanual_parallel_matches_sequential(tmp_path):
    from bifold_tpu.env.bimanual_evaluator import (
        SoftgymBimanualEvaluator, SoftgymBimanualParallelEvaluator)

    n_samples, pool = 3, 2
    samples = _bimanual_cache(tmp_path, n_samples=n_samples)

    seq = SoftgymBimanualEvaluator(cache_dir=str(tmp_path),
                                   policy=_bimanual_policy(),
                                   processor=_processor(), image_size=64)
    _install_cheap_envs(seq)
    seq.evaluate(samples=samples)
    seq_summary = seq.summary()
    seq.close()

    sizes = []
    par = SoftgymBimanualParallelEvaluator(cache_dir=str(tmp_path),
                                           policy=_bimanual_policy(sizes),
                                           processor=_processor(),
                                           image_size=64, pool=pool)
    _install_cheap_envs(par, pool=pool)
    par.evaluate(samples=samples)
    par_summary = par.summary()
    par.close()

    assert set(par_summary) == set(seq_summary)
    for k, v in seq_summary.items():
        np.testing.assert_allclose(par_summary[k], v, rtol=1e-9, atol=1e-12,
                                   err_msg=k)
    assert sizes == [pool, pool]  # 3 samples -> groups of 2 + 1, both padded


def test_batchify_many_pads_and_stacks():
    a = {"x": np.ones((2, 3)), "s": "hello"}
    b = {"x": np.zeros((2, 3)), "s": "world"}
    out = batchify_many([a, b], pad_to=4)
    assert out["x"].shape == (4, 2, 3)
    np.testing.assert_array_equal(out["x"][2], b["x"])  # padded w/ last
    assert out["s"] == ["hello", "world", "world", "world"]

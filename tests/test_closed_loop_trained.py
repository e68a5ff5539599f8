"""Closed-loop evaluation with a TRAINED policy (VERDICT r1 missing #3/#6).

Full learning-to-fold loop on TshirtFold: collect oracle demonstrations in
the simulator (rendered RGB-D + projected pick/place pixels + instructions,
with the unseen-instruction paraphrases as augmentation), train a tiny
unimanual SigLip on them, then run the REAL ``SoftgymSingleEvaluator`` loop
(policy -> pixel action -> 3-D unprojection -> pick-and-place primitive) and
assert the trained policy tracks the oracle rollout much closer than a
random-pixel policy. Fails if any stage of policy->pixel->3D->primitive
regresses. Counterpart of the reference's eval protocol
(softgym_evaluator.py:161-254).

Also covers the cache-builder's CLOTH3D ``.obj`` scene path with a
fabricated mesh directory (env/cache_builder.py:64).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bifold_tpu.data.processor import Processor
from bifold_tpu.data.loader import collate
from bifold_tpu.data.utils import get_mask_from_depth
from bifold_tpu.env.action import Action
from bifold_tpu.env.cloth_env import ClothEnv
from bifold_tpu.env.softgym_evaluator import SoftgymSingleEvaluator
from bifold_tpu.ops.geometry import pixel_from_world

RES = 64


def _proc(partition: str, spatial_augment: bool = False) -> Processor:
    return Processor(
        {"model_image_size": RES, "text_encoder": None, "sigma": 3,
         "requires_graph": False, "spatial_augment": spatial_augment,
         "strategy": "gmm", "mask_depth": True, "standardize_depth": False,
         "spatial_augmentations": {"rotate_augmentation": [-6.0, 7.0],
                                   "translate_augmentation": [-4.0, 5.0]}},
        partition=partition, max_context_length=3,
        autoprocessor_name="siglip")  # 64-token padding, the tower's max


def _make_eval(cache_dir, policy):
    ev = SoftgymSingleEvaluator(cache_dir=str(cache_dir), policy=policy,
                                processor=_proc("test"), image_size=RES)
    ev.env = ClothEnv(render_dim=RES, native=False, substeps=2, iterations=6)
    # this test's error thresholds were calibrated on flat-shaded renders;
    # pin the visual domain (the 700-step memorization fit is slightly worse
    # on the smooth-shaded default — 0.073 vs 0.055 first-action error —
    # which is about pixel statistics, not the closed-loop machinery under
    # test; test_sim covers the shading modes)
    ev.env.sim.shading = "flat"
    ev.K = ev.env.intrinsic_from_fov(RES, RES)
    ev.error_threshold = ev.env.particle_radius * 2
    return ev


def _to_px(ev, world):
    uv = np.asarray(pixel_from_world(world[None], ev.env.camera_matrix, ev.K))
    return np.clip(uv[:, 0], 0, RES - 1)


def _collect_demonstrations(ev, angle):
    """Oracle rollout at the eval angle, capturing (obs, instruction, pixels)
    per action; the usi paraphrases label the same frames.

    The demonstrators draw their instruction paraphrases (and for some tasks
    the action order) from python's global ``random`` — seed it to the same
    value the eval run will use so the memorized (frame, instruction) pairs
    are exactly what the evaluator asks for."""
    import random
    random.seed(7)

    config, state = ev.cached_configs[0], ev.cached_states[0]
    ev.reset(config=config, state=state, task="TshirtFold", random_angle=angle)
    kp_idx = ev.cached_keypoints[0]
    eval_datas = ev.demonstrator.get_eval_instruction()

    records = []
    rows = zip(eval_datas[0]["pick"], eval_datas[0]["place"],
               eval_datas[0]["gammas"], eval_datas[0]["instructions"],
               eval_datas[1]["instructions"])
    for pick_i, place_i, gamma, instr_si, instr_usi in rows:
        rgb, depth = ev.env.render_image()
        mask = get_mask_from_depth(depth)
        kp = ev.env.get_keypoints(kp_idx)
        pick_pos = kp[pick_i]
        place_pos = pick_pos + gamma * (kp[place_i] - pick_pos)
        for instr in (instr_si, instr_usi):
            records.append(_proc("train").make_raw(
                rgb=rgb, depth=depth, mask=mask, instruction=instr,
                pick=_to_px(ev, pick_pos)[None],
                place=_to_px(ev, place_pos)[None]))
        ev.env.pick_and_place_single(pick_pos.copy(), place_pos.copy())

    raw = collate(records)
    # one clean batch for the fit check + augmented epochs for robustness to
    # the small frame drift a rollout's own imperfect actions introduce
    clean = _proc("train").process_batch(raw, key=jax.random.key(0))
    aug_proc = _proc("train", spatial_augment=True)
    augmented = [aug_proc.process_batch(raw, key=jax.random.key(i + 1))
                 for i in range(5)]
    return clean, augmented


def _train_policy(clean, augmented, steps=700):
    """Fit a tiny unimanual SigLip on the demonstrations (all params
    trainable — this is a memorization smoke, not a generalization study;
    the augmented epochs make the fit robust to small frame drift)."""
    import optax

    from bifold_tpu.losses import build_loss
    from bifold_tpu.models import build_model, decode_action

    model = build_model({
        "name": "siglip", "image_size": RES, "is_bimanual": False,
        "patch_size": 16, "automodel_name": "tiny", "dim": 64, "lora": False,
        "depth": 1, "heads": 4, "threshold": 0.01})

    def to_device(b):
        return {k: jnp.asarray(v) for k, v in b.items()
                if isinstance(v, (np.ndarray, jnp.ndarray))}

    device = to_device(clean)
    batches = [device] + [to_device(b) for b in augmented]
    variables = jax.jit(
        lambda k: model.init(k, device, deterministic=True))(jax.random.key(0))
    params = variables["params"]
    loss_fn = build_loss({"name": "bce_gaussmap", "is_bimanual": False,
                          "mask_pick_heatmap": False})
    tx = optax.adam(3e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, b):
        def of(p):
            out = model.apply({"params": p}, b, deterministic=True)
            return loss_fn(out, b)[0]
        loss, g = jax.value_and_grad(of)(params)
        updates, opt = tx.update(g, opt)
        return optax.apply_updates(params, updates), opt, loss

    for i in range(steps):
        params, opt, loss = step(params, opt, batches[i % len(batches)])
    assert np.isfinite(float(loss))

    # sanity: the fitted policy reproduces its training pixels closely
    out = jax.jit(lambda p, b: model.apply({"params": p}, b,
                                           deterministic=True))(params, device)
    dec = decode_action(out, device, is_bimanual=False, threshold=0.01)
    kp_err = float(jnp.abs(jnp.asarray(dec["pick"])
                           - device["pick"][:, 0]).mean())
    assert kp_err < 2, f"policy failed to fit demonstrations (err {kp_err})"

    eval_step = jax.jit(lambda p, b: model.apply({"params": p}, b,
                                                 deterministic=True))

    def policy(b):
        dev = {k: jnp.asarray(v) for k, v in b.items()
               if isinstance(v, np.ndarray) and v.dtype != object}
        out = eval_step(params, dev)
        decoded = decode_action(out, dev, is_bimanual=False, threshold=0.01)
        return Action(pick=np.asarray(decoded["pick"]),
                      place=np.asarray(decoded["place"])), out

    return policy


def _record_model_turns(ev, record):
    """Wrap execute_model to record which action indices the policy (vs the
    oracle) executed per regime — the evaluator's dispatch rule verbatim."""
    orig = ev.execute_model

    def patched(eval_data, kp_idx, eval_index, eval_name, *a, **kw):
        flags = list(eval_data["flags"])
        record[eval_name] = [i for i, f in enumerate(flags)
                             if (f == 0) == (eval_index < 2)]
        return orig(eval_data, kp_idx, eval_index, eval_name, *a, **kw)

    ev.execute_model = patched


def _first_action_errors(ev, turns):
    """Particle error right after the FIRST policy-executed action, per seen
    regime. Later actions compound chaotically (every rollout drifts from the
    oracle's exact trajectory), so the first action is the clean measure of
    whether the policy outputs sensible pixels; 'ut' is excluded — its
    model-turn actions are novel instructions absent from training."""
    errs = ev.additional_metrics["error"]["TshirtFold"]
    return [errs[name][turns[name][0]] for name in ("si", "usi")
            if turns.get(name)]


def test_trained_policy_beats_random_closed_loop(tmp_path):
    from bifold_tpu.env.cache_builder import build_cache

    # one cached config, so the evaluator's draw (rng(0): config index, then
    # the rotation angle) is exactly the condition we demonstrate at
    build_cache("Tshirt", tmp_path, n_configs=1, settle_steps=20)
    rng = np.random.default_rng(0)
    rng.integers(1)
    angle = float(rng.uniform(-40, 40))

    collector = _make_eval(tmp_path, policy=None)
    collector.load_cache("Tshirt")
    clean, augmented = _collect_demonstrations(collector, angle)
    collector.close()
    policy = _train_policy(clean, augmented)

    import random

    ev_model = _make_eval(tmp_path, policy)
    model_turns: dict = {}
    _record_model_turns(ev_model, model_turns)
    random.seed(7)  # same paraphrase draws as the demonstration collection
    ev_model.evaluate(num_evals=1, task="TshirtFold", seed=0)
    model_first = _first_action_errors(ev_model, model_turns)
    model_mean = float(np.mean(
        ev_model.additional_metrics["error"]["TshirtFold"]["si"]))
    summary = ev_model.summary()
    ev_model.close()

    rand = np.random.default_rng(1)

    def random_policy(b):
        return Action(pick=rand.uniform(0, RES, (1, 2)),
                      place=rand.uniform(0, RES, (1, 2))), None

    ev_rand = _make_eval(tmp_path, random_policy)
    rand_turns: dict = {}
    _record_model_turns(ev_rand, rand_turns)
    random.seed(7)
    ev_rand.evaluate(num_evals=1, task="TshirtFold", seed=0)
    rand_first = _first_action_errors(ev_rand, rand_turns)
    rand_mean = float(np.mean(
        ev_rand.additional_metrics["error"]["TshirtFold"]["si"]))
    ev_rand.close()

    assert model_turns == rand_turns  # same seeded action schedule
    # the trained policy's first action tracks the oracle's fold distinctly
    # closer than random pixels (measured: ~0.055 vs ~0.092; at 64 px one
    # pixel is ~1.3 particle radii, so ~0.05 is near the floor ANY pixel
    # policy can reach — the roundtrip pixel-oracle test hits ~6 radii at
    # 224 px)...
    assert np.mean(model_first) < 0.7 * np.mean(rand_first), (
        model_first, rand_first)
    # ...and stays within ~10 particle radii of the oracle in absolute terms
    assert np.mean(model_first) < 10 * 0.00625, model_first
    # ...and over whole rollouts (chaos-dominated) it must not be worse
    assert model_mean <= rand_mean, (model_mean, rand_mean)
    assert "TshirtFold si" in summary


def test_cache_builder_obj_mesh_dir(tmp_path):
    """build_cache(mesh_dir=...) consumes CLOTH3D-style .obj files through
    ClothEnv's mesh_path scene setup (cache_builder.py:64-75)."""
    import pickle

    from bifold_tpu.env.cache_builder import build_cache
    from bifold_tpu.env.garments import trousers_mesh

    verts, faces, _ = trousers_mesh(resolution=15)
    mesh_dir = tmp_path / "meshes"
    mesh_dir.mkdir()
    lines = [f"v {x} {y} {z}" for x, y, z in verts]
    lines += ["f " + " ".join(str(i + 1) for i in f) for f in faces]
    (mesh_dir / "0001.obj").write_text("\n".join(lines))

    path = build_cache("Trousers", tmp_path, n_configs=1,
                       mesh_dir=str(mesh_dir), settle_steps=5)
    with open(path, "rb") as f:
        cache = pickle.load(f)
    assert len(cache["configs"]) == 1
    assert cache["configs"][0]["mesh_path"].endswith("0001.obj")
    assert "keypoints" not in cache
    # the settled state has the mesh's (deduped) particle count
    n_unique = len(np.unique(np.round(verts / 1e-6).astype(np.int64), axis=0))
    assert cache["states"][0]["particle_pos"].shape == (n_unique, 4)


@pytest.mark.skipif(
    __import__("os").environ.get("BIFOLD_RENDER_AB", "") in ("", "0"),
    reason="renderer-sensitivity A/B is CPU-minutes; opt in with "
           "BIFOLD_RENDER_AB=1 (run once per round)")
def test_render_shading_domain_sensitivity(tmp_path):
    """Quantify the shading domain gap for closed-loop policies (VERDICT r2
    next #7): train the tiny policy on FLAT-shaded renders, then evaluate
    closed-loop on (a) flat renders (in-domain) and (b) smooth-shaded
    renders (the GL-like default — a render-domain shift). The cross-domain
    penalty is the measured sensitivity; it must stay well under the
    random-policy error (i.e. the policy does not collapse under the other
    shading model)."""
    import random

    from bifold_tpu.env.cache_builder import build_cache

    build_cache("Tshirt", tmp_path, n_configs=1, settle_steps=20)
    rng = np.random.default_rng(0)
    rng.integers(1)
    angle = float(rng.uniform(-40, 40))

    collector = _make_eval(tmp_path, policy=None)
    collector.load_cache("Tshirt")
    clean, augmented = _collect_demonstrations(collector, angle)
    collector.close()
    policy = _train_policy(clean, augmented)

    results = {}
    for shading in ("flat", "smooth"):
        ev = _make_eval(tmp_path, policy)
        ev.env.sim.shading = shading
        turns: dict = {}
        _record_model_turns(ev, turns)
        random.seed(7)
        ev.evaluate(num_evals=1, task="TshirtFold", seed=0)
        results[shading] = float(np.mean(_first_action_errors(ev, turns)))
        ev.close()

    print(f"[render-ab] first-action particle error: "
          f"flat {results['flat']:.4f} vs smooth {results['smooth']:.4f} "
          f"(random-policy reference ~0.092)")
    # in-domain sanity + bounded cross-domain degradation: the smooth-render
    # rollout must stay far below the ~0.092 random-policy error
    assert results["flat"] < 10 * 0.00625
    assert results["smooth"] < 0.8 * 0.092, results

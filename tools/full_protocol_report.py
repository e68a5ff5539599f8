"""Round artifact: the FULL 5-task x 3-regime closed-loop protocol with a
TRAINED policy (VERDICT r4 item 7).

Counterpart of the reference's eval protocol
(/root/reference/bifold/env/softgym_evaluator.py:103-128 summary semantics,
:161-254 rollout loop; dispatched from __main__.py:248-255). Pipeline:

1. build one cached config per cloth type (the deterministic seed-0 draw);
2. collect oracle demonstrations for EVERY task at exactly the
   configuration/angle/paraphrase stream the seed-0 evaluation will draw
   (global ``random`` seeded per task, mirroring the evaluator);
3. train ONE tiny unimanual SigLip (64 px) on the pooled demonstrations;
4. run SoftgymSingleEvaluator.evaluate for all 5 tasks (si/usi/ut regimes,
   oracle + model turns) and write the summary table
   (particle-error success + IoU) to --json-out / stdout.

Runtime: tens of minutes on the 1-CPU host (XPBD sim at 64 px). The output
is committed as docs/FULL_PROTOCOL_r5.md so policy-quality drift is
diffable round-over-round.
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

RES = 64
SEED_PARAPHRASE = 7
SEED_EVAL = 0


def _proc(partition: str, spatial_augment: bool = False):
    from bifold_tpu.data.processor import Processor

    return Processor(
        {"model_image_size": RES, "text_encoder": None, "sigma": 3,
         "requires_graph": False, "spatial_augment": spatial_augment,
         "strategy": "gmm", "mask_depth": True, "standardize_depth": False,
         "spatial_augmentations": {"rotate_augmentation": [-6.0, 7.0],
                                   "translate_augmentation": [-4.0, 5.0]}},
        partition=partition, max_context_length=3,
        autoprocessor_name="siglip")


def _make_eval(cache_dir, policy):
    from bifold_tpu.env.cloth_env import ClothEnv
    from bifold_tpu.env.softgym_evaluator import SoftgymSingleEvaluator

    ev = SoftgymSingleEvaluator(cache_dir=str(cache_dir), policy=policy,
                                processor=_proc("test"), image_size=RES)
    ev.env = ClothEnv(render_dim=RES, native=False, substeps=2, iterations=6)
    ev.env.sim.shading = "flat"  # matches the demo-collection renders
    ev.K = ev.env.intrinsic_from_fov(RES, RES)
    ev.error_threshold = ev.env.particle_radius * 2
    return ev


def _eval_draw(task, n_configs=1):
    """Reproduce evaluate()'s seed-0 rng draws: config index, then angle."""
    rng = np.random.default_rng(SEED_EVAL)
    idx = int(rng.integers(n_configs))
    if task == "StraightFold":
        angle = float(rng.uniform(-80, 80))
    else:
        from bifold_tpu.env.softgym_evaluator import task_to_cloth_type
        cloth3d = task_to_cloth_type[task] not in ("Square", "Rectangular")
        angle = float(rng.uniform(-40, 40)) if cloth3d \
            else float(rng.uniform(0, 40))
    return idx, angle


def _collect_task(ev, task, records):
    """Oracle rollout at the eval draw, capturing (obs, instruction, pixels)
    per action; si + usi paraphrases label the same frames."""
    from bifold_tpu.data.utils import get_mask_from_depth
    from bifold_tpu.env.softgym_evaluator import task_to_cloth_type
    from bifold_tpu.ops.geometry import pixel_from_world

    cloth_type = task_to_cloth_type[task]
    ev.cloth3d = cloth_type not in ("Square", "Rectangular")
    ev.load_cache(cloth_type)
    idx, angle = _eval_draw(task, len(ev.cached_configs))
    random.seed(SEED_PARAPHRASE)

    config, state = ev.cached_configs[idx], ev.cached_states[idx]
    ev.reset(config=config, state=state, task=task, random_angle=angle)
    if ev.cloth3d and ev.cached_keypoints is not None:
        kp_idx = ev.cached_keypoints[idx]
    else:
        kp_idx = ev.env.get_square_keypoints_idx()
    if task == "StraightFold":
        angle_mode = int(abs(angle) > 45) + int(angle < -45)
        eval_datas = ev.demonstrator.get_eval_instruction(angle_mode)
    else:
        eval_datas = ev.demonstrator.get_eval_instruction()

    def to_px(world):
        uv = np.asarray(pixel_from_world(world[None], ev.env.camera_matrix,
                                         ev.K))
        return np.clip(uv[:, 0], 0, RES - 1)

    proc = _proc("train")
    rows = zip(eval_datas[0]["pick"], eval_datas[0]["place"],
               eval_datas[0]["gammas"], eval_datas[0]["instructions"],
               eval_datas[1]["instructions"])
    n = 0
    for pick_i, place_i, gamma, instr_si, instr_usi in rows:
        rgb, depth = ev.env.render_image()
        mask = get_mask_from_depth(depth)
        kp = ev.env.get_keypoints(kp_idx)
        pick_pos = kp[pick_i]
        place_pos = pick_pos + gamma * (kp[place_i] - pick_pos)
        for instr in dict.fromkeys((instr_si, instr_usi)):
            records.append(proc.make_raw(
                rgb=rgb, depth=depth, mask=mask, instruction=instr,
                pick=to_px(pick_pos)[None], place=to_px(place_pos)[None]))
            n += 1
        ev.env.pick_and_place_single(pick_pos.copy(), place_pos.copy())
    return n


def _train_policy(records, steps):
    import jax
    import jax.numpy as jnp
    import optax

    from bifold_tpu.data.loader import collate
    from bifold_tpu.env.action import Action
    from bifold_tpu.losses import build_loss
    from bifold_tpu.models import build_model, decode_action

    raw = collate(records)
    clean = _proc("train").process_batch(raw, key=jax.random.key(0))
    aug_proc = _proc("train", spatial_augment=True)
    augmented = [aug_proc.process_batch(raw, key=jax.random.key(i + 1))
                 for i in range(5)]

    model = build_model({
        "name": "siglip", "image_size": RES, "is_bimanual": False,
        "patch_size": 16, "automodel_name": "tiny", "dim": 64, "lora": False,
        "depth": 2, "heads": 4, "threshold": 0.01})

    def to_device(b):
        return {k: jnp.asarray(v) for k, v in b.items()
                if isinstance(v, (np.ndarray, jnp.ndarray))}

    device = to_device(clean)
    batches = [device] + [to_device(b) for b in augmented]
    params = jax.jit(lambda k: model.init(k, device, deterministic=True))(
        jax.random.key(0))["params"]
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

    t0 = time.time()
    loss = float("nan")  # --steps 0 smokes the pipeline without training
    for i in range(steps):
        params, opt, loss = step(params, opt, batches[i % len(batches)])
        if i % 200 == 0:
            print(f"[protocol] train step {i}: loss={float(loss):.4f}",
                  file=sys.stderr, flush=True)
    loss = float(loss)
    out = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, deterministic=True))(params, device)
    dec = decode_action(out, device, is_bimanual=False, threshold=0.01)
    fit_err = float(jnp.abs(jnp.asarray(dec["pick"])
                            - device["pick"][:, 0]).mean())
    print(f"[protocol] trained {steps} steps in {time.time()-t0:.0f}s "
          f"loss={loss:.4f} fit_px_err={fit_err:.2f}",
          file=sys.stderr, flush=True)

    eval_step = jax.jit(lambda p, b: model.apply({"params": p}, b,
                                                 deterministic=True))

    def policy(b):
        dev = {k: jnp.asarray(v) for k, v in b.items()
               if isinstance(v, np.ndarray) and v.dtype != object}
        o = eval_step(params, dev)
        decoded = decode_action(o, dev, is_bimanual=False, threshold=0.01)
        return Action(pick=np.asarray(decoded["pick"]),
                      place=np.asarray(decoded["place"])), o

    return policy, {"train_loss": loss, "fit_px_err": fit_err,
                    "n_records": len(records), "steps": steps}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--num-evals", type=int, default=1)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    import tempfile

    from bifold_tpu.env.cache_builder import build_cache
    from bifold_tpu.env.softgym_evaluator import TASKS, task_to_cloth_type

    cache_dir = Path(tempfile.mkdtemp(prefix="protocol_cache_"))
    for cloth_type in sorted(set(task_to_cloth_type.values())):
        print(f"[protocol] building cache: {cloth_type}", file=sys.stderr,
              flush=True)
        build_cache(cloth_type, cache_dir, n_configs=1, settle_steps=20)

    records: list = []
    collector = _make_eval(cache_dir, policy=None)
    per_task = {}
    for task in TASKS:
        t0 = time.time()
        per_task[task] = _collect_task(collector, task, records)
        print(f"[protocol] {task}: {per_task[task]} demonstration records "
              f"({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)
    collector.close()

    policy, train_info = _train_policy(records, args.steps)

    ev = _make_eval(cache_dir, policy)
    for task in TASKS:
        t0 = time.time()
        random.seed(SEED_PARAPHRASE)  # same paraphrase stream as collection
        ev.evaluate(num_evals=args.num_evals, task=task, seed=SEED_EVAL)
        print(f"[protocol] evaluated {task} ({time.time()-t0:.0f}s)",
              file=sys.stderr, flush=True)
    summary = {k: (float(v) if isinstance(v, (int, float, np.floating))
                   else v) for k, v in ev.summary().items()}
    ev.close()

    report = {"image_size": RES, "num_evals": args.num_evals,
              "train": train_info, "records_per_task": per_task,
              "summary": summary}
    print(json.dumps(report, indent=2, sort_keys=True))
    if args.json_out:
        Path(args.json_out).write_text(
            json.dumps(report, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()

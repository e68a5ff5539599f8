"""Bimanual closed-loop evaluation: replay dataset frames, dual-arm dispatch.

Counterpart of /root/reference/bifold/env/softgym_evaluator.py:423-624
(SoftgymBimanualEvaluator): for each test sample, the cached scene state for
its start frame is restored, the scripted oracle executes the ground-truth
grasp-vertex action (dual or single arm), the env resets, context frames are
reconstructed by replaying their cached states, and the model acts from the
render; DUMMY (-1) pixels on an arm demote to a single-arm primitive
(reference :519-540). Metrics match the unimanual evaluator.

Cache layout (`<cache>/bimanual.pkl`): configs/states/keypoints keyed by
frame name; keypoints hold left/right pick/place particle indices (built by
our cache tooling, or converted from the reference's bimanual cache).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from bifold_tpu.data.utils import get_mask_from_depth
from bifold_tpu.env.softgym_evaluator import SoftgymEvaluator, batchify
from bifold_tpu.metrics.utils import iou

__all__ = ["SoftgymBimanualEvaluator", "SoftgymBimanualRolloutEvaluator",
           "SoftgymBimanualRolloutEvaluatorDeng"]


class SoftgymBimanualEvaluator(SoftgymEvaluator):
    def evaluate(self, dataloader=None, samples: Optional[Dict] = None,
                 num_evals: Optional[int] = None, **_) -> None:
        self.cloth3d = True
        self.load_cache("bimanual")
        if samples is None:
            samples = self._collect_samples(dataloader, num_evals)
        for idx in range(len(samples["frame_start"])):
            name = samples["frame_start"][idx]
            self.task = name.split("_")[1] if "_" in name else name
            if self.task not in self.success:
                self.success[self.task] = []
                for k in (["error", "iou"]
                          + [f"iou_success_{t}" for t in self.iou_thresholds]):
                    self.additional_metrics.setdefault(k, {})[self.task] = []
            config = self.cached_configs[name]
            state = self.cached_states[name]
            keypoints = self.cached_keypoints[name]

            oracle_result, oracle_mask = self.execute_oracle(keypoints, config, state)
            self.execute_model(samples, idx, name, oracle_result, oracle_mask)

    @staticmethod
    def _collect_samples(dataloader, limit: Optional[int]) -> Dict:
        """Flatten test-dataloader batches into the parallel-list sample dict
        the replay loop walks (frame_start / raw_instruction / context)."""
        out: Dict = {"frame_start": [], "raw_instruction": [], "context": []}
        n = 0
        for batch in dataloader:
            names = batch.get("frame_start")
            instrs = batch.get("raw_instruction")
            ctxs = batch.get("context_names", [""] * len(instrs))
            for name, instr, ctx in zip(names, instrs, ctxs):
                out["frame_start"].append(name)
                out["raw_instruction"].append(instr)
                out["context"].append(ctx)
                n += 1
                if limit and n >= limit:
                    return out
        if not out["context"][0]:
            out.pop("context")
        return out

    # ------------------------------------------------------------------

    def execute_oracle(self, keypoints: Dict, config, state):
        self.reset(config=config, state=state)
        pos = self.env.get_keypoints()
        lp = keypoints.get("left_pick_idx")
        rp = keypoints.get("right_pick_idx")
        if lp is not None and rp is not None:
            self.env.pick_and_place_dual(
                pos[lp], pos[keypoints["left_place_idx"]],
                pos[rp], pos[keypoints["right_place_idx"]])
        elif lp is not None:
            self.env.pick_and_place_single(pos[lp], pos[keypoints["left_place_idx"]])
        else:
            assert rp is not None
            self.env.pick_and_place_single(pos[rp], pos[keypoints["right_place_idx"]])
        _, depth = self.env.render_image()
        return (self.env.sim.get_positions()[:, :3],
                get_mask_from_depth(depth))

    def execute_model(self, samples, idx, name, oracle_result, oracle_mask) -> None:
        context = None
        if "context" in samples:
            context = []
            for ctx in str(samples["context"][idx]).split("+"):
                if ctx:
                    self.reset(config=self.cached_configs[ctx],
                               state=self.cached_states[ctx])
                    rgb, depth = self.env.render_image()
                    context.append({"rgb": rgb, "depth": depth,
                                    "mask": get_mask_from_depth(depth)})

        self.reset(config=self.cached_configs[name],
                   state=self.cached_states[name])
        rgb, depth = self.env.render_image()
        mask = get_mask_from_depth(depth)
        sample = self.processor(
            depth=depth, rgb=rgb, mask=mask, context=context,
            instruction=samples["raw_instruction"][idx],
            matrix_world_to_camera=self.env.camera_matrix, K=self.K)

        action, _raw = self.policy(batchify(sample))
        lp = np.asarray(action.left_pick).reshape(-1)[:2]
        lpl = np.asarray(action.left_place).reshape(-1)[:2]
        rp = np.asarray(action.right_pick).reshape(-1)[:2]
        rpl = np.asarray(action.right_place).reshape(-1)[:2]

        left_ok = np.all(lp >= 0) and np.all(lpl >= 0)
        right_ok = np.all(rp >= 0) and np.all(rpl >= 0)
        if left_ok and right_ok:
            self.env.pick_and_place_dual(
                self.env.get_world_coord_from_pixel(lp, depth),
                self.env.get_world_coord_from_pixel(lpl, depth),
                self.env.get_world_coord_from_pixel(rp, depth),
                self.env.get_world_coord_from_pixel(rpl, depth))
        elif right_ok:
            self.env.pick_and_place_single(
                self.env.get_world_coord_from_pixel(rp, depth),
                self.env.get_world_coord_from_pixel(rpl, depth))
        else:
            assert left_ok, "confidence gating must leave at least one arm active"
            self.env.pick_and_place_single(
                self.env.get_world_coord_from_pixel(lp, depth),
                self.env.get_world_coord_from_pixel(lpl, depth))

        particle_pos = self.env.sim.get_positions()[:, :3]
        _, depth = self.env.render_image()
        mask = get_mask_from_depth(depth)

        error = float(np.linalg.norm(oracle_result - particle_pos, axis=1).mean())
        iou_value = iou(mask, oracle_mask)
        self.success[self.task].append(error < self.error_threshold)
        self.additional_metrics["error"][self.task].append(error)
        self.additional_metrics["iou"][self.task].append(iou_value)
        for thresh in self.iou_thresholds:
            self.additional_metrics[f"iou_success_{thresh}"][self.task].append(
                (iou_value > thresh) * 100)


def _dual_arm_rollout_step(evaluator, sample: Dict, depth: np.ndarray) -> None:
    """Shared model-action execution: dual-arm unless an arm is DUMMY-gated
    (reference softgym_evaluator.py:519-540, repeated in the rollout
    evaluators at :674-697 and :826-849)."""
    action, _raw = evaluator.policy(batchify(sample))
    env = evaluator.env
    lp = np.asarray(action.left_pick).reshape(-1)[:2]
    lpl = np.asarray(action.left_place).reshape(-1)[:2]
    rp = np.asarray(action.right_pick).reshape(-1)[:2]
    rpl = np.asarray(action.right_place).reshape(-1)[:2]
    left_ok = np.all(lp >= 0) and np.all(lpl >= 0)
    right_ok = np.all(rp >= 0) and np.all(rpl >= 0)
    if left_ok and right_ok:
        env.pick_and_place_dual(
            env.get_world_coord_from_pixel(lp, depth),
            env.get_world_coord_from_pixel(lpl, depth),
            env.get_world_coord_from_pixel(rp, depth),
            env.get_world_coord_from_pixel(rpl, depth))
    elif right_ok:
        env.pick_and_place_single(env.get_world_coord_from_pixel(rp, depth),
                                  env.get_world_coord_from_pixel(rpl, depth))
    else:
        assert left_ok, "confidence gating must leave one arm active"
        env.pick_and_place_single(env.get_world_coord_from_pixel(lp, depth),
                                  env.get_world_coord_from_pixel(lpl, depth))


class SoftgymBimanualRolloutEvaluator(SoftgymEvaluator):
    """Open-ended instruction rollout from one cached frame
    (reference softgym_evaluator.py:627-746): reset to the named state, then
    execute a user-provided instruction sequence closed-loop, feeding each
    executed step back as temporal context. No metrics — a demo/qualitative
    driver."""

    def evaluate(self, sample_name: str, instructions, **_) -> None:
        self.cloth3d = True
        self.load_cache("bimanual")
        if sample_name not in self.cached_configs:
            raise KeyError(f"{sample_name} not in the bimanual cache")
        self.task = sample_name.split("_")[1] if "_" in sample_name else sample_name
        self.reset(config=self.cached_configs[sample_name],
                   state=self.cached_states[sample_name])
        self._rollout(instructions)

    def _rollout(self, instructions) -> None:
        rgb, depth = self.env.render_image()
        mask = get_mask_from_depth(depth)
        context = []
        for instruction in instructions:
            sample = self.processor(
                depth=depth, rgb=rgb, mask=mask, context=context,
                instruction=instruction,
                matrix_world_to_camera=self.env.camera_matrix, K=self.K)
            _dual_arm_rollout_step(self, sample, depth)
            context.append({"rgb": rgb.copy(), "mask": mask.copy(),
                            "depth": depth.copy()})
            rgb, depth = self.env.render_image()
            mask = get_mask_from_depth(depth)


class SoftgymBimanualRolloutEvaluatorDeng(SoftgymBimanualRolloutEvaluator):
    """Two-instruction folding rollouts of the bimanual model on the Deng
    unimanual cloth types (reference softgym_evaluator.py:750-892): per trial,
    reset a cached Tshirt/Trousers scene (no rotation) and run the fixed
    left-right + top-bottom half-fold instruction pair."""

    instructions = {
        "TshirtFold": ["Fold the Tshirt in half, left to right.",
                       "Fold the Tshirt in half, top to bottom."],
        "TrousersFold": ["Fold the Trousers in half, left to right.",
                         "Fold the Trousers in half, top to bottom."],
    }

    def evaluate(self, num_evals: int, task: str, seed=None, **_) -> None:
        from bifold_tpu.env.softgym_evaluator import task_to_cloth_type
        cloth_type = task_to_cloth_type[task]
        self.cloth3d = cloth_type not in ("Square", "Rectangular")
        self.load_cache(cloth_type)
        rng = np.random.default_rng(seed)
        self.task = task
        for _ in range(num_evals):
            idx = int(rng.integers(len(self.cached_configs)))
            self.reset(config=self.cached_configs[idx],
                       state=self.cached_states[idx], task=task, random_angle=0)
            self._rollout(self.instructions[task])

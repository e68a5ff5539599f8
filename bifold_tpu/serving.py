"""Fixed-shape batch-1 serving: image + instruction -> pixel Action.

The rollout-latency path SURVEY.md §7 calls out: closed-loop evaluation and
robot serving run batch-1 inference in the control loop, so the whole
pipeline — preprocessing, forward, heatmap decode — must be ONE pre-compiled
program with static shapes (text padded to the tokenizer's fixed length, one
image at the model's resolution), never recompiling across instructions.

    server = ServingModel.from_checkpoint("checkpoints/best.ckpt", cfg)
    action = server.predict(rgb, depth, mask, "fold the left sleeve in")

``predict`` accepts raw host arrays at any square input resolution (the
resize matrices re-trace only when the input resolution changes) and returns
a numpy-backed Action plus optional raw heatmaps.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bifold_tpu.config import Config
from bifold_tpu.data.processor import Processor
from bifold_tpu.env.action import Action
from bifold_tpu.models import build_model, decode_action

__all__ = ["ServingModel"]


class ServingModel:
    def __init__(self, model, variables, processor: Processor,
                 threshold: Optional[float] = None):
        self.model = model
        self.variables = jax.tree_util.tree_map(jnp.asarray, variables)
        self.processor = processor
        self.threshold = float(model.threshold if threshold is None else threshold)

        def _serve(variables, batch):
            out = model.apply(variables, batch, deterministic=True)
            decoded = decode_action(
                out, batch, is_bimanual=model.is_bimanual,
                constrain_pick_mask=getattr(model, "constrain_pick_mask", True),
                threshold=self.threshold)
            return decoded, out

        self._serve = jax.jit(_serve)

    # ------------------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, checkpoint_path: str, cfg: Config | dict,
                        threshold: Optional[float] = None) -> "ServingModel":
        from bifold_tpu.utils.checkpoint import load_checkpoint

        cfg = Config(cfg) if not isinstance(cfg, Config) else cfg
        model = build_model(cfg["model"])
        payload = load_checkpoint(checkpoint_path, restore_rng=False)
        variables = {"params": payload["params"], **(payload.get("extra_vars") or {})}
        mcl = dict(cfg["model"]).get("context_length")
        processor = Processor(
            dict(cfg["processor"]), partition="test",
            max_context_length=mcl,
            autoprocessor_name=dict(cfg["model"]).get("automodel_name"))
        return cls(model, variables, processor, threshold=threshold)

    # ------------------------------------------------------------------

    def predict(self, rgb=None, depth=None, mask=None, instruction: str = "",
                context: Optional[List[Dict]] = None,
                return_raw_output: bool = False):
        """One observation -> Action. Static shapes: re-traces only when the
        input camera resolution changes."""
        sample = self.processor(rgb=rgb, depth=depth, mask=mask,
                                instruction=instruction, context=context)
        batch: Dict[str, Any] = {}
        for k, v in sample.items():
            if isinstance(v, np.ndarray) and v.dtype != object and v.ndim > 0 \
                    and not isinstance(v.flat[0], str):
                batch[k] = jnp.asarray(v)[None]
        decoded, out = self._serve(self.variables, batch)
        decoded = jax.tree_util.tree_map(np.asarray, decoded)
        if self.model.is_bimanual:
            action = Action(left_pick=decoded["left_pick"],
                            right_pick=decoded["right_pick"],
                            left_place=decoded["left_place"],
                            right_place=decoded["right_place"])
        else:
            action = Action(pick=decoded["pick"], place=decoded["place"])
        if return_raw_output:
            return action, jax.tree_util.tree_map(np.asarray, out)
        return action

    def warmup(self, input_size: int) -> None:
        """Pre-compile for a camera resolution before entering the control
        loop (first compile is seconds-to-minutes; subsequent calls are ms)."""
        rng = np.random.default_rng(0)
        self.predict(
            rgb=rng.integers(0, 255, (input_size, input_size, 3), dtype=np.uint8),
            depth=rng.random((input_size, input_size)).astype(np.float32),
            mask=np.ones((input_size, input_size), np.float32),
            instruction="warmup")

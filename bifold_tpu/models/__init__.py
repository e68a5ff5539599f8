"""Model registry + action decoding + trainability masks.

Counterpart of /root/reference/bifold/models/__init__.py: string-keyed model
and component factories whose config keys are constructor kwargs, plus the
``get_action`` decode path (no-grad forward -> heatmap argmax/mask-snap ->
bimanual confidence gating -> Action).

TPU split of responsibilities: the Flax module owns the forward; decoding is
the jitted :func:`decode_action` (everything up to the host-side Action
construction stays on device); parameter freezing is expressed as an
optimizer-side mask (:func:`trainable_mask`) rather than
``requires_grad`` flags.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from bifold_tpu.core.registry import Registry
from bifold_tpu.env.action import DUMMY_PICK, Action
from bifold_tpu.models.bifold_models import (
    RGBOnly,
    SigLip,
    SiglipSequential,
    TextConditionedUNet,
)
from bifold_tpu.ops.heatmap import decode_heatmap, gate_bimanual

__all__ = [
    "Models",
    "Components",
    "build_model",
    "decode_action",
    "get_action",
    "trainable_mask",
    "DUMMY_PICK",
]

Models: Registry = Registry("model")
Models.register("siglip")(SigLip)
Models.register("siglip_sequential")(SiglipSequential)
Models.register("rgb_clip")(RGBOnly)
Models.register("text_unet")(TextConditionedUNet)

# Component registry (reference Components.get_by_name,
# models/__init__.py:30-44): pick/place heads and fusion modules by name.
from bifold_tpu.models.fusion import ConcatTransformer, CrossAttention  # noqa: E402
from bifold_tpu.models.pickplace import (  # noqa: E402
    PickPlaceConvDecoder,
    PickPlaceTransDecoder,
)

Components: Registry = Registry("component")
Components.register("pick_place_convdecoder")(PickPlaceConvDecoder)
Components.register("pick_place_transdecoder")(PickPlaceTransDecoder)
Components.register("concat_transformer")(ConcatTransformer)
Components.register("crossattention")(CrossAttention)

# config keys that are not Flax module fields
_NON_FIELD_KEYS = {"name"}


def build_model(cfg: dict, **overrides: Any):
    """Instantiate a model module from its config node (keys = fields).

    Unknown *config* keys are an error (config keys ARE constructor
    signatures, reference models/__init__.py:26-27); unknown *overrides*
    (trainer conveniences like ``remat`` that only some families accept) are
    dropped silently.
    """
    node = {k: (tuple(v) if isinstance(v, list) else v)
            for k, v in dict(cfg).items() if k not in _NON_FIELD_KEYS}
    cls = Models.get(dict(cfg)["name"])
    valid = {f.name for f in cls.__dataclass_fields__.values()}  # type: ignore[attr-defined]
    unknown = set(node) - valid
    if unknown:
        raise TypeError(f"{cls.__name__} got unknown config keys: {sorted(unknown)}")
    node.update({k: v for k, v in overrides.items() if k in valid})
    return cls(**node)


def decode_action(output: dict, sample: dict, *, is_bimanual: bool,
                  constrain_pick_mask: bool = True, threshold: float = 0.5):
    """Jit-friendly decode of a heatmap dict to pixel arrays + confidences.

    Mirrors BaseModel.get_action (reference models/__init__.py:79-173):
    pick snapped to the cloth mask (when available and enabled), place decoded
    unconstrained, dual-arm confidence gating with the guarantee that at least
    one arm acts. Returns a dict of float32 (B, 2) pixel arrays.
    """
    mask = sample.get("mask") if constrain_pick_mask else None
    use_mask = mask is not None
    if use_mask:
        mask = mask.reshape(mask.shape[0], mask.shape[-2], mask.shape[-1])

    def decode_pick(node_or_map):
        """Graph mode: pick heatmaps are per-node probabilities; the pixel
        comes from the projected node coordinates (reference
        models/__init__.py:84-106). Dense mode: argmax + mask snap."""
        if node_or_map.ndim == 2 and "pixel_sampled_pc" in sample:
            idx = jnp.argmax(node_or_map, axis=1)
            pc = sample["pixel_sampled_pc"]  # (B, N, 2)
            pix = jnp.take_along_axis(pc, idx[:, None, None].repeat(2, -1), 1)[:, 0]
            conf = jnp.max(node_or_map, axis=1)
            return pix.astype(jnp.float32), conf
        return decode_heatmap(node_or_map, mask, use_mask=use_mask)

    if is_bimanual:
        lp, lc = decode_pick(output["left_pick_heatmap"])
        rp, rc = decode_pick(output["right_pick_heatmap"])
        lpl, _ = decode_heatmap(output["left_place_heatmap"])
        rpl, _ = decode_heatmap(output["right_place_heatmap"])
        lp, rp, lpl, rpl = gate_bimanual(lp, rp, lpl, rpl, lc, rc, threshold)
        return {"left_pick": lp, "right_pick": rp,
                "left_place": lpl, "right_place": rpl,
                "left_confidence": lc, "right_confidence": rc}
    pick, conf = decode_pick(output["pick_heatmap"])
    place, _ = decode_heatmap(output["place_heatmap"])
    return {"pick": pick.astype(jnp.float32), "place": place.astype(jnp.float32),
            "confidence": conf}


def get_action(model, variables, sample, *, threshold: float | None = None,
               return_raw_output: bool = False):
    """Forward + decode -> Action (host boundary).

    ``threshold=None`` uses the model's configured threshold. Note the
    reference *hardcodes* 0.01 regardless of config
    (models/__init__.py:61, conf says 0.5) — pass ``threshold=0.01`` to
    reproduce that behavior exactly.
    """
    output = model.apply(variables, sample, deterministic=True)
    thr = model.threshold if threshold is None else threshold
    decoded = jax.tree_util.tree_map(
        np.asarray,
        decode_action(output, sample, is_bimanual=model.is_bimanual,
                      constrain_pick_mask=getattr(model, "constrain_pick_mask", True),
                      threshold=thr))
    if model.is_bimanual:
        action = Action(left_pick=decoded["left_pick"], right_pick=decoded["right_pick"],
                        left_place=decoded["left_place"], right_place=decoded["right_place"])
    else:
        action = Action(pick=decoded["pick"], place=decoded["place"])
    if return_raw_output:
        return action, output
    return action


_FROZEN_SUBTREES = ("siglip_model", "clip_encoder", "text_encoder")
_ALWAYS_TRAINABLE = ("lora_a", "lora_b")


def trainable_mask(params, *, lora: bool = True,
                   frozen_subtrees: tuple = _FROZEN_SUBTREES) -> Any:
    """Bool pytree: True = trainable.

    Reference semantics (siglip.py:33-43, rgb_clip.py:30, text_unet.py:53-60,
    __main__.py:113): backbone towers are frozen (entirely when ``lora`` is
    off; except LoRA adapter params when on); everything else trains.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    out = []
    for path, _ in flat:
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        in_frozen = any(k in frozen_subtrees for k in keys)
        is_lora = any(k in _ALWAYS_TRAINABLE for k in keys)
        out.append((lora and is_lora) or not in_frozen)
    return jax.tree_util.tree_unflatten(treedef, out)


def precast_frozen(params, mask, compute_dtype, *, min_size: int = 2 ** 16):
    """Cast big FROZEN float32 leaves to the model's compute dtype, once.

    Frozen tower weights never receive optimizer updates, so their f32
    masters are dead weight: every train step re-casts them to the compute
    dtype at use (flax dtype promotion), which reads the f32 copy and
    writes a bf16 one — pure HBM traffic. Casting them up front is
    value-identical (the same f32->bf16 rounding happens either way — the
    serving path ships the same transform, test_serving_precast) and
    removes the per-step converts plus half the frozen-weight reads.

    Trainable leaves keep f32 masters (Adam needs them); small leaves
    (LayerNorm scales, biases) stay f32 like serving's precast — some
    consumers read them at full precision. No-op when ``compute_dtype`` is
    f32/None. Checkpoints saved from a precast trainer store the frozen
    tower in bf16 (half size); restoring one keeps bf16, restoring an f32
    checkpoint re-applies the cast on the next ``prepare_train``.
    """
    if compute_dtype is None or compute_dtype == jnp.float32:
        return params

    def _cast(p, t):
        if (not t and hasattr(p, "dtype") and p.dtype == jnp.float32
                and p.size >= min_size):
            return p.astype(compute_dtype)
        return p

    return jax.tree_util.tree_map(_cast, params, mask)

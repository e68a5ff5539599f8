"""Jittable losses over heatmap dicts.

Counterpart of /root/reference/bifold/losses/__init__.py (Losses registry,
ComposedLoss, BCEGaussMap, BCEMask, DiceLoss, FocalLoss). Losses here are
pure functions ``loss_fn(output, sample) -> (scalar, intermediates)`` built by
string-keyed factories, so the whole loss lives inside ``jit`` and fuses with
the backward pass.

Numerics note: the reference computes ``nn.BCELoss`` on sigmoid outputs,
which clamps ``log(p)`` at -100 (torch's documented behavior). We reproduce
the same clamp so saturated heatmaps score identically; see
:func:`binary_cross_entropy`.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from bifold_tpu.core.registry import Registry

__all__ = [
    "binary_cross_entropy_with_logits",
    "Losses",
    "build_loss",
    "binary_cross_entropy",
    "bce_gaussmap",
    "bce_mask",
    "dice",
    "focal",
    "composed",
]

LossFn = Callable[[Dict[str, Any], Dict[str, Any]], Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]

Losses: Registry = Registry("loss")

# torch.nn.BCELoss clamps each log term at -100 for stability.
_LOG_CLAMP = -100.0


def binary_cross_entropy(p, target, reduction: str = "mean"):
    """Elementwise BCE on probabilities: torch-exact values, finite gradients.

    Values use torch's log clamp at -100. Gradients route through an
    eps-clipped probability (torch's BCELoss backward also bounds the
    denominator at 1e-12) — the naive ``max(log(p), -100)`` formulation
    yields ``inf * 0 = NaN`` gradients the moment a sigmoid saturates to
    exactly 0/1, which torch never surfaces because its backward is
    hand-written. One saturated pixel would otherwise NaN the whole update
    through the global-norm clip.
    """
    p = p.astype(jnp.float32)
    target = target.astype(jnp.float32)
    # lower eps matches torch's backward denominator bound; the upper bound
    # must be representable in f32 (1 - 1e-12 rounds back to exactly 1.0)
    p_safe = jnp.clip(p, 1e-12, 1.0 - 1e-6)
    safe = -(target * jnp.log(p_safe) + (1.0 - target) * jnp.log1p(-p_safe))
    log_p = jnp.maximum(jnp.log(p), _LOG_CLAMP)
    log_1p = jnp.maximum(jnp.log1p(-p), _LOG_CLAMP)
    exact = -(target * log_p + (1.0 - target) * log_1p)
    # value = exact (torch parity incl. the -100 clamp); grad = d(safe)/dp
    loss = safe + jax.lax.stop_gradient(exact - safe)
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def binary_cross_entropy_with_logits(x, target, reduction: str = "mean"):
    """Fused sigmoid+BCE on logits: grad = sigmoid(x) - t, never zero.

    The TPU-native training path (SURVEY.md §7): BCE-on-probabilities cannot
    escape exact sigmoid saturation (d sigmoid = 0 in f32 past |x| ~ 17;
    the torch reference shares the pathology). Values agree with the
    probability BCE to float precision while the sigmoid is unsaturated and
    stay exact (softplus) beyond, where the clamped version plateaus at 100.
    """
    x = x.astype(jnp.float32)
    target = target.astype(jnp.float32)
    loss = jnp.maximum(x, 0.0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def _squeeze_mask(mask):
    """(B, 1, H, W) or (B, H, W) -> (B, H, W)."""
    if mask.ndim == 4:
        return mask[:, 0]
    return mask


@Losses.register("bce_gaussmap")
def bce_gaussmap(is_bimanual: bool, mask_pick_heatmap: bool = False, **_) -> LossFn:
    """Per-head BCE between predicted heatmaps and Gaussian targets, summed over
    {pick,place}x{arm} (reference losses/__init__.py:54-109)."""

    heads = (["left_pick", "right_pick", "left_place", "right_place"]
             if is_bimanual else ["pick", "place"])

    def loss_fn(output, sample):
        intermediates = {}
        total = 0.0
        for head in heads:
            target = sample[f"{head}_heatmap"]
            if head.endswith("pick") and mask_pick_heatmap:
                target = target * _squeeze_mask(sample["mask"])
            if f"{head}_logits" in output:
                # fused logits path: saturation-safe gradients
                curr = binary_cross_entropy_with_logits(
                    output[f"{head}_logits"], target)
            else:
                # probability path (mask-gated heads / raw-heatmap callers)
                curr = binary_cross_entropy(output[f"{head}_heatmap"], target)
            intermediates[head] = curr
            total = total + curr
        return total, intermediates

    return loss_fn


@Losses.register("bce_mask")
def bce_mask(**_) -> LossFn:
    """BCE of the mask head vs the cloth mask (losses/__init__.py:112-117)."""

    def loss_fn(output, sample):
        return binary_cross_entropy(
            output["mask_heatmap"], _squeeze_mask(sample["mask"])), {}

    return loss_fn


@Losses.register("dice")
def dice(**_) -> LossFn:
    """DETR/SAM-style dice loss on the mask head, summed over the batch
    (losses/__init__.py:126-136)."""

    def loss_fn(output, sample):
        inputs = output["mask_heatmap"].reshape(output["mask_heatmap"].shape[0], -1)
        targets = _squeeze_mask(sample["mask"]).reshape(inputs.shape[0], -1)
        targets = targets.astype(jnp.float32)
        numerator = 2.0 * (inputs * targets).sum(axis=1)
        denominator = inputs.sum(axis=-1) + targets.sum(axis=-1)
        return (1.0 - (numerator + 1.0) / (denominator + 1.0)).sum(), {}

    return loss_fn


@Losses.register("focal")
def focal(alpha: float = 0.25, gamma: float = 2.0, **_) -> LossFn:
    """Focal loss on the mask head. Reproduces the reference's reduction
    exactly — ``loss.mean(1).sum()`` over a (B, H, W) map, i.e. mean over rows
    then sum over batch*cols (losses/__init__.py:139-155, a quirk we keep for
    parity)."""

    def loss_fn(output, sample):
        prob = output["mask_heatmap"].astype(jnp.float32)
        targets = _squeeze_mask(sample["mask"]).astype(jnp.float32)
        ce = binary_cross_entropy(prob, targets, reduction="none")
        p_t = prob * targets + (1.0 - prob) * (1.0 - targets)
        loss = ce * (1.0 - p_t) ** gamma
        if alpha >= 0:
            alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
            loss = alpha_t * loss
        return loss.mean(axis=1).sum(), {}

    return loss_fn


@Losses.register("composed")
def composed(loss_names, weights, **kwargs) -> LossFn:
    """Weighted sum of named losses with per-loss intermediate logging
    (losses/__init__.py:30-51)."""
    assert len(loss_names) == len(weights)
    parts = {name: Losses.get(name)(**kwargs) for name in loss_names}
    weight_of = dict(zip(loss_names, weights))

    def loss_fn(output, sample):
        intermediates = {}
        total = 0.0
        for name, fn in parts.items():
            curr, curr_inter = fn(output, sample)
            total = total + curr * weight_of[name]
            intermediates[name] = curr
            for k, v in curr_inter.items():
                intermediates[f"{name} {k}"] = v
        return total, intermediates

    return loss_fn


def build_loss(cfg: dict) -> LossFn:
    """Build a loss from its config node; keys are factory kwargs
    (reference Losses.get_by_name splat semantics)."""
    node = dict(cfg)
    name = node.pop("name")
    return Losses.get(name)(**node)

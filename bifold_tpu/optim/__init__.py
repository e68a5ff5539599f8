"""Optimizers and LR schedules (optax).

Counterpart of /root/reference/bifold/optim/__init__.py: ``Optimizers`` /
``Schedulers`` string factories and the ``LinearWarmup`` per-step schedule
(linear warmup over ``warmup_portion`` of total iters from ``warmup_start_lr``
to the base lr, then optional cosine annealing to 0).

TPU split of responsibilities: freezing is an optimizer concern here — frozen
subtrees (see :func:`bifold_tpu.models.trainable_mask`) ride
``optax.set_to_zero`` so they carry no Adam state and their updates fuse to
no-ops, instead of torch's ``requires_grad`` filtering
(reference __main__.py:113).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax

from bifold_tpu.core.registry import Registry

__all__ = ["Optimizers", "Schedulers", "build_schedule", "build_optimizer"]

Optimizers: Registry = Registry("optimizer")
Schedulers: Registry = Registry("scheduler")


@Optimizers.register("adam")
def _adam(learning_rate, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, **_):
    """torch.optim.Adam semantics (reference optim/__init__.py:9): its
    ``weight_decay`` is COUPLED L2 — wd*p joins the GRADIENT before the
    moment updates — so it must be ``add_decayed_weights`` chained BEFORE
    adam, not optax.adamw (decoupled, applied after sqrt(v) normalization:
    materially different regularization dynamics)."""
    adam = optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay), adam)
    return adam


@Optimizers.register("adamw")
def _adamw(learning_rate, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01, **_):
    return optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                       weight_decay=weight_decay)


@Optimizers.register("sgd")
def _sgd(learning_rate, momentum=0.0, nesterov=False, **_):
    # no reference counterpart (it ships Adam/AdamW only) — kept for
    # sharded-vs-unsharded numerics assertions (Adam's first-step sign(g)
    # amplifies float noise; CLAUDE.md correctness notes) and completeness
    return optax.sgd(learning_rate, momentum=momentum or None,
                     nesterov=nesterov)


@Schedulers.register("linear_warmup")
def _linear_warmup(base_lr: float, max_iters: int, warmup_portion: float = 0.1,
                   warmup_start_lr: float = 0.0, use_cosine_decay: bool = True,
                   **_) -> optax.Schedule:
    """Reference LinearWarmup (optim/__init__.py:28-92) as an optax schedule."""
    warmup_steps = int(warmup_portion * max_iters)
    if use_cosine_decay:
        return optax.warmup_cosine_decay_schedule(
            init_value=warmup_start_lr, peak_value=base_lr,
            warmup_steps=warmup_steps, decay_steps=max_iters, end_value=0.0)
    schedules = [optax.linear_schedule(warmup_start_lr, base_lr, warmup_steps),
                 optax.constant_schedule(base_lr)]
    return optax.join_schedules(schedules, [warmup_steps])


def build_schedule(scheduler_cfg: Optional[dict], base_lr: float,
                   max_iters: int) -> optax.Schedule:
    """None/name=null -> constant lr (reference Schedulers.get_by_name)."""
    node = dict(scheduler_cfg or {})
    name = node.pop("name", None)
    if name is None:
        return optax.constant_schedule(base_lr)
    return Schedulers.get(name)(base_lr=base_lr, max_iters=max_iters, **node)


def build_optimizer(
    optim_cfg: dict,
    scheduler_cfg: Optional[dict] = None,
    *,
    max_iters: int = 1,
    trainable: Optional[Any] = None,
    gradient_clip: Optional[float] = None,
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """Compose clip -> adam(schedule), masked to the trainable subtree.

    ``trainable`` is a bool pytree (True = train); frozen leaves get
    ``optax.set_to_zero`` and zero optimizer state. Returns ``(tx, schedule)``
    — the schedule is also returned standalone so the trainer can log lr per
    step (reference __main__.py:154-159).

    ``skip_nonfinite`` (optim config, default 0 = off) wraps the update in
    ``optax.apply_if_finite(n)``: non-finite gradients skip the update
    (after n consecutive skips the non-finite update applies, surfacing the
    divergence). ``accumulate_steps`` (optim config, default 1) enables gradient
    accumulation via ``optax.MultiSteps``: k micro-batches average into one
    optimizer update (effective batch = k * batch_size), clipping and the
    lr schedule apply per UPDATE, and ``max_iters`` (micro-steps) is
    rescaled so warmup/cosine spans the same wall-clock training run. A
    TPU-native extra over the reference (which always updates per batch):
    it buys large effective batches without the activation memory — the
    accumulators live only on the trainable subtree (they sit inside the
    trainable branch of the multi_transform, so frozen/LoRA-masked leaves
    carry no accumulator state).
    """
    node = dict(optim_cfg)
    name = node.pop("name")
    base_lr = node.pop("lr")
    accumulate = int(node.pop("accumulate_steps", 1) or 1)
    skip_nonfinite = int(node.pop("skip_nonfinite", 0) or 0)
    n_updates = max(1, -(-max_iters // accumulate))
    schedule = build_schedule(scheduler_cfg, base_lr, n_updates)

    tx = Optimizers.get(name)(learning_rate=schedule, **node)
    if gradient_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(gradient_clip), tx)
    if skip_nonfinite:
        # production hardening: a NaN/inf gradient step (data spike, rare
        # numerics) SKIPS the update (params + inner opt state unchanged)
        # instead of poisoning the run; after ``skip_nonfinite`` consecutive
        # bad steps the error propagates (a persistent divergence must not
        # spin forever). optax.apply_if_finite keeps a total_notfinite
        # counter in the opt state for observability.
        tx = optax.apply_if_finite(tx, max_consecutive_errors=skip_nonfinite)
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate).gradient_transformation()
    if trainable is not None:
        labels = jax.tree_util.tree_map(
            lambda t: "train" if t else "frozen", trainable)
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels)
    return tx, schedule

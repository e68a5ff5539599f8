"""GPipe-style pipeline parallelism over stacked-layer parameters.

The reference is single-GPU (SURVEY.md §2.4) — pipelining, like the rest of
``bifold_tpu.parallel``, is a TPU-native capability addition for scaling past
one chip's HBM. It exploits the framework's canonical parameter layout: every
transformer stack already stores its per-layer parameters as ``[depth, ...]``
stacked leaves (models/layers.py ``Transformer``; the checkpoint format), so a
pipeline stage is nothing more than a ``depth/pp`` slice of the leading axis —
the same arrays, sharded over a ``pp`` mesh axis, with NO re-plumbing of the
model or the checkpoint.

Idiomatic-TPU design (scaling-book pipelining chapter, re-derived for
``shard_map``): the schedule is data-flow inside one jitted program —
``lax.scan`` over ticks, ``lax.ppermute`` moving activations stage→stage over
ICI — not host-side orchestration of per-stage programs (the torch/GPipe
pattern). XLA overlaps each tick's ppermute with the next tick's compute, and
the whole pipeline differentiates through ``jax.grad`` like any other jax
code: the backward schedule (reverse ppermute, per-stage dW accumulation over
microbatches) falls out of AD + the scan transpose — it is not hand-written.

Deliberate scope: GPipe (fill-and-drain) schedule, ``depth % pp == 0``,
activation-shaped single-array carries. Bubble fraction is (pp-1)/(M+pp-1);
callers pick ``microbatches`` accordingly. At BiFold's ~200M-param scale one
v5e chip holds the whole model, so dp(+fsdp, +tp) saturates a slice and pp
defaults off — this module is the verified primitive for the larger-model
regime (and for hosts whose HBM cannot hold ``depth`` full layers), tested
for exact fwd+grad equivalence against the sequential stack on a CPU mesh.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["gpipe"]


def _stage_slice_tree(params: Any) -> None:
    leaves = jax.tree_util.tree_leaves(params)
    if not leaves:
        raise ValueError("gpipe: empty stage_params")


def gpipe(body: Callable[[Any, Any], Any],
          stacked_params: Any,
          x: Any,
          *,
          mesh: Mesh,
          axis: str = "pp",
          microbatches: int,
          check_vma: bool = False) -> Any:
    """Run ``depth`` layers over ``x`` as a ``pp``-stage microbatch pipeline.

    ``body(layer_params, h) -> h`` applies ONE layer: ``layer_params`` is the
    per-layer slice of ``stacked_params`` (leading ``depth`` axis removed),
    ``h`` a ``[microbatch, ...]`` activation — a single array or a pytree
    whose leaves all share the leading batch dim (per-sample side inputs
    like attention masks ride the carry through the pipe with their
    microbatch; ``body`` returns the same structure, passing them through).
    The caller closes over
    broadcast operands (masks) and rng handling; wrap ``body`` in
    ``jax.checkpoint`` for per-layer remat.

    ``stacked_params``: pytree whose leaves carry the ``[depth, ...]`` stack
    (the framework's native layout). ``depth`` must divide by the ``pp`` mesh
    axis size; the leading axis is sharded over ``pp`` so each stage holds
    only its ``depth/pp`` layers — ZeRO-for-depth, which is the point: a
    model whose stack exceeds one chip's HBM never materializes off-stage
    layers. ``x``: ``[batch, ...]`` with ``batch % microbatches == 0``.

    Equivalent (exactly, fwd and grad — tested) to the sequential
    ``for l in range(depth): x = body(params[l], x)``.

    Implementation: ``shard_map`` manual over ``axis`` only (other mesh axes
    — dp/fsdp/tp — stay automatic, so batch sharding and in-layer tp
    annotations compose); inside, ``lax.scan`` over ``M + pp - 1`` ticks.
    Each tick every stage runs its local layers (``lax.scan`` over the
    ``depth/pp`` slice) and ``ppermute``s the activation to the next stage;
    stage 0 feeds microbatch ``t`` from the input, stage ``pp-1`` collects
    microbatch ``t-(pp-1)``. Bubble ticks compute on don't-care data whose
    results are masked out of the collection buffer (and therefore carry no
    gradient). The final ``psum`` over ``pp`` materializes the output on all
    stages (zeros elsewhere), keeping the result replicated over ``pp`` like
    its input.
    """
    _stage_slice_tree(stacked_params)
    depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    pp = mesh.shape[axis]
    if depth % pp:
        raise ValueError(f"gpipe: depth {depth} not divisible by {axis}={pp}")
    x_leaves = jax.tree_util.tree_leaves(x)
    batch = x_leaves[0].shape[0]
    if any(l.shape[0] != batch for l in x_leaves):
        raise ValueError("gpipe: all activation leaves must share the "
                         f"leading batch dim, got "
                         f"{[l.shape for l in x_leaves]}")
    m = int(microbatches)
    if batch % m:
        raise ValueError(f"gpipe: batch {batch} not divisible by "
                         f"microbatches={m}")
    tmap = jax.tree_util.tree_map
    xs = tmap(lambda l: l.reshape(m, batch // m, *l.shape[1:]), x)
    ticks = m + pp - 1
    perm = [(i, i + 1) for i in range(pp - 1)]

    # 16-bit float activations cross the shard_map boundary as f32 and are
    # cast back inside (exact: a widening cast, and their AD cotangent psum
    # has a single nonzero contributor — only stage 0 consumes xs). Reason:
    # XLA:CPU's AllReducePromotion pass CHECK-fails on bf16 all-reduces
    # ("Invalid binary instruction opcode copy"), and the transpose of a
    # replicated shard_map input IS a psum over pp.
    orig_dtypes = tmap(lambda l: l.dtype, xs)
    _wide = (jnp.bfloat16, jnp.float16)
    xs = tmap(lambda l: l.astype(jnp.float32) if l.dtype in _wide else l, xs)

    def per_stage(p_local, xs_rep):
        xs_rep = tmap(lambda l, d: l.astype(d), xs_rep, orig_dtypes)
        stage = jax.lax.axis_index(axis)

        def local_layers(h):
            def step(hh, pl):
                return body(pl, hh), None
            h, _ = jax.lax.scan(step, h, p_local)
            return h

        def tick(carry, t):
            held, out = carry
            inp = tmap(
                lambda xr, hd: jnp.where(stage == 0,
                                         xr[jnp.minimum(t, m - 1)], hd),
                xs_rep, held)
            y = local_layers(inp)
            # last stage banks microbatch t-(pp-1) once the pipe has filled
            slot = t - (pp - 1)
            valid = jnp.logical_and(stage == pp - 1, slot >= 0)

            def bank(o, yy):
                idx = (jnp.clip(slot, 0, m - 1),) + (0,) * (o.ndim - 1)
                banked = jax.lax.dynamic_update_slice(
                    o, yy[None].astype(o.dtype), idx)
                return jnp.where(valid, banked, o)

            out = tmap(bank, out, y)
            recv = (tmap(lambda yy: jax.lax.ppermute(yy, axis, perm), y)
                    if perm else y)
            return (recv, out), None

        out0 = tmap(jnp.zeros_like, xs_rep)
        held0 = tmap(lambda xr: jnp.zeros_like(xr[0]), xs_rep)
        (_, out), _ = jax.lax.scan(tick, (held0, out0), jnp.arange(ticks))

        def replicate(o):
            # zeros on every stage but the last; psum replicates the real
            # output. 16-bit floats ride f32 (exact: one nonzero
            # contributor) — XLA:CPU's AllReducePromotion pass CHECK-fails
            # cloning a bf16 all-reduce ("Invalid binary instruction opcode
            # copy"); TPU handles bf16 all-reduce natively either way.
            if o.dtype in (jnp.bfloat16, jnp.float16):
                return jax.lax.psum(o.astype(jnp.float32),
                                    axis).astype(o.dtype)
            return jax.lax.psum(o, axis)

        return tmap(replicate, out) if pp > 1 else out

    mapped = jax.shard_map(
        per_stage,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        axis_names={axis},
        check_vma=check_vma,
    )
    out = mapped(stacked_params, xs)
    return tmap(lambda l: l.reshape(batch, *l.shape[2:]), out)

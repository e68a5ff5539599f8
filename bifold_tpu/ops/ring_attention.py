"""Ring attention: sequence-parallel (context-parallel) flash attention.

The reference is single-GPU and materializes full (B, H, N, N) score tensors
(/root/reference/bifold/models/transformer.py:28-43) — sequences are capped by
one device's memory. This module removes that cap the TPU-native way: shard
the *token* dimension over an ``sp`` mesh axis and rotate K/V chunks around
the ICI ring (`lax.ppermute`) while each device's resident query chunk folds
every visiting chunk into an online-softmax merge. Activations per device are
O(N/sp); no attention tensor ever exists whole.

Design (scaling-book context-parallelism recipe, built on the repo's own
Pallas flash kernels rather than a reference translation):

- per (device, ring step): the unmodified flash forward kernel
  (ops/flash_attention.py ``_fwd_impl``) runs on (q_local, k_chunk, v_chunk)
  and returns the chunk output + row logsumexp; partials merge exactly via
  ``logaddexp`` weights, so the result is bit-equivalent to softmax over the
  full row (tested against the XLA reference).
- backward is a second ring pass, hand-written as the ``custom_vjp``: the
  fused flash backward kernel (``_bwd_impl``) is *already correct per chunk*
  when given the GLOBAL logsumexp and output — ``p = exp(s - lse_global)``
  and ``delta = Σ g·out`` are row-global quantities — so each step adds this
  device's contribution to the visiting chunk's dk/dv (which ride the ring
  with their chunk and arrive home fully accumulated) and to the local dq.
  XLA overlaps each step's ppermute with the next step's kernel.
- sp composes with dp/tp: attention is pointwise in batch and heads, so the
  ``shard_map`` can be manual over (batch_axis, head_axis, sp) at once — the
  ring only ever communicates over ``sp``.

The flash kernels keep full K/V *rows* VMEM-resident per (b·h) grid row
(their residency ceiling is ~2.4k·d·f32 today); under ring attention that
row is only N/sp long, so the same kernels reach sp-times-longer context
without modification.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from bifold_tpu.ops.flash_attention import _bwd_impl, _fwd_impl

__all__ = ["ring_attention"]


def _merge_weights(lse_acc, lse_c):
    """Online-softmax merge weights for two partials with row logsumexps.

    Returns (lse_merged, w_acc, w_c) with ``out = w_acc*o_acc + w_c*o_c``.
    Safe at the -inf initial accumulator: the masked fill is a finite -1e5
    (flash kernel ``_NEG``), so per-chunk lse is always finite and only the
    first step sees -inf (where exp(-inf - finite) == 0 exactly).
    """
    lse_new = jnp.logaddexp(lse_acc, lse_c)
    return lse_new, jnp.exp(lse_acc - lse_new), jnp.exp(lse_c - lse_new)


def _to_bnh1(w):
    # (b, h, nq) row weights -> (b, nq, h, 1) broadcastable over outputs
    return w.transpose(0, 2, 1)[..., None]


def _ring_perm(sp):
    return [(i, (i + 1) % sp) for i in range(sp)]


def _ring_fwd_pass(q, k, v, mask, axis, sp, scale, block_q, block_k,
                   interpret):
    """Ring forward on local chunks; returns (out [q.dtype], lse (b,h,nq))."""
    b, nq, h, d = q.shape
    perm = _ring_perm(sp)

    def step(carry, _):
        k_c, v_c, m_c, o_acc, lse_acc = carry
        o_c, lse_c = _fwd_impl(q, k_c, v_c, m_c, scale, block_q, block_k,
                               interpret)
        lse_acc, w_old, w_new = _merge_weights(lse_acc, lse_c)
        o_acc = (o_acc * _to_bnh1(w_old)
                 + o_c.astype(jnp.float32) * _to_bnh1(w_new))
        if sp > 1:
            k_c, v_c, m_c = (jax.lax.ppermute(t, axis, perm)
                             for t in (k_c, v_c, m_c))
        return (k_c, v_c, m_c, o_acc, lse_acc), None

    o0 = jnp.zeros((b, nq, h, d), jnp.float32)
    lse0 = jnp.full((b, h, nq), -jnp.inf, jnp.float32)
    (_, _, _, out, lse), _ = jax.lax.scan(
        step, (k, v, mask, o0, lse0), None, length=sp)
    return out.astype(q.dtype), lse


@functools.partial(
    jax.custom_vjp,
    nondiff_argnames=("axis", "sp", "scale", "block_q", "block_k",
                      "interpret"))
def _ring_shard(q, k, v, mask, axis, sp, scale, block_q, block_k, interpret):
    out, _ = _ring_fwd_pass(q, k, v, mask, axis, sp, scale, block_q, block_k,
                            interpret)
    return out


def _ring_shard_fwd(q, k, v, mask, axis, sp, scale, block_q, block_k,
                    interpret):
    out, lse = _ring_fwd_pass(q, k, v, mask, axis, sp, scale, block_q,
                              block_k, interpret)
    return out, (q, k, v, mask, out, lse)


def _ring_shard_bwd(axis, sp, scale, block_q, block_k, interpret, res, g):
    q, k, v, mask, out, lse = res
    perm = _ring_perm(sp)

    def step(carry, _):
        k_c, v_c, m_c, dk_c, dv_c, dq = carry
        # per-chunk flash backward with the GLOBAL lse/out/g: exact partial
        # gradients of the full-row softmax (see module docstring)
        dq_add, dk_add, dv_add = _bwd_impl(q, k_c, v_c, m_c, out, lse, g,
                                           scale, block_q, block_k, interpret)
        dq = dq + dq_add.astype(jnp.float32)
        dk_c = dk_c + dk_add.astype(jnp.float32)
        dv_c = dv_c + dv_add.astype(jnp.float32)
        if sp > 1:
            # dk/dv ride the ring with their chunk: after sp steps every
            # chunk has collected every device's contribution and is home
            k_c, v_c, m_c, dk_c, dv_c = (
                jax.lax.ppermute(t, axis, perm)
                for t in (k_c, v_c, m_c, dk_c, dv_c))
        return (k_c, v_c, m_c, dk_c, dv_c, dq), None

    zeros_kv = jnp.zeros(k.shape, jnp.float32)
    (_, _, _, dk, dv, dq), _ = jax.lax.scan(
        step, (k, v, mask, zeros_kv, jnp.zeros(v.shape, jnp.float32),
               jnp.zeros(q.shape, jnp.float32)),
        None, length=sp)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None)


_ring_shard.defvjp(_ring_shard_fwd, _ring_shard_bwd)


def ring_attention(
    q,
    k,
    v,
    key_mask=None,
    *,
    mesh: Mesh,
    axis: str = "sp",
    batch_axis: str | None = None,
    head_axis: str | None = None,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
):
    """Sequence-parallel flash attention over (B, N, H, Dh) -> same shape.

    ``q``/``k``/``v`` are the GLOBAL arrays with the token dim sharded over
    mesh axis ``axis`` (``N % mesh.shape[axis] == 0``); ``key_mask`` (B, N)
    zeroes attention to padded keys, like
    :func:`bifold_tpu.ops.attention.dot_product_attention`. Fully
    differentiable (hand-written ring backward).

    ``batch_axis`` / ``head_axis`` optionally name mesh axes the batch/head
    dims are sharded over — they join the manual ``shard_map`` axes (the ring
    never communicates over them), so dp x sp x tp runs without any
    cross-device traffic beyond the K/V ring itself.

    Equivalent (tested, fwd + grad) to single-device attention over the full
    sequence; use when N outgrows one chip's flash-kernel VMEM residency
    (ops/flash_attention.py ``_check_residency``) or activation HBM.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    sp = int(mesh.shape[axis])
    b, n = q.shape[0], q.shape[1]
    if k.shape[1] != n:
        raise ValueError(
            f"ring_attention: cross-length attention unsupported "
            f"(nq {n} != nk {k.shape[1]})")
    if n % sp:
        raise ValueError(
            f"ring_attention: sequence length {n} not divisible by "
            f"{axis}={sp}")
    if key_mask is None:
        key_mask = jnp.ones((b, n), jnp.int32)
    key_mask = key_mask.astype(jnp.int32)

    manual = {axis} | {a for a in (batch_axis, head_axis) if a}
    qs = P(batch_axis, axis, head_axis, None)
    ms = P(batch_axis, axis)
    mapped = jax.shard_map(
        lambda qq, kk, vv, mm: _ring_shard(qq, kk, vv, mm, axis, sp, scale,
                                           block_q, block_k, interpret),
        mesh=mesh,
        in_specs=(qs, qs, qs, ms),
        out_specs=qs,
        axis_names=manual,
        check_vma=False,
    )
    return mapped(q, k, v, key_mask)

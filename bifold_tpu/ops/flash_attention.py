"""Pallas TPU flash attention (online-softmax, K/V streamed per Q block).

The fusion transformer's concat sequence (~text 65 + 3x577 context + 577
current ≈ 2.4k tokens at 384 px) is the longest attention in the model and the
reference materializes full (B, H, N, N) score tensors for it
(/root/reference/bifold/models/transformer.py:28-43). This kernel never
materializes scores in HBM: each grid step owns one (block_q, d) query tile in
VMEM and streams (block_k, d) key/value tiles with the standard
online-softmax recurrence (running max m, normalizer l, accumulator acc in
float32), so HBM traffic is O(N*d) instead of O(N^2).

Layout in: (B, N, H, Dh); internally (B*H, N, Dh). Padding to block multiples
is handled here (padded keys get key_mask 0; padded queries are sliced off).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

_NEG = -100000.0  # matches the XLA backend / reference fill value


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, block_k, kv_len):
    q = q_ref[0].astype(jnp.float32) * scale  # (bq, d)
    bq = q.shape[0]
    d = q.shape[1]
    num_k = kv_len // block_k

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)  # (bk, d)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        kmask = mask_ref[0, 0, pl.ds(i * block_k, block_k)]  # (bk,)
        s = jnp.where(kmask[None, :] == 0, _NEG, s)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _xla_reference(q, k, v, key_mask, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if key_mask is not None:
        logits = jnp.where(key_mask[:, None, None, :] == 0, _NEG, logits)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnames=("scale", "block_q", "block_k", "interpret"))
def _flash_with_vjp(q, k, v, key_mask, scale, block_q, block_k, interpret):
    return _flash_forward(q, k, v, key_mask, scale=scale, block_q=block_q,
                          block_k=block_k, interpret=interpret)


def _flash_fwd(q, k, v, key_mask, scale, block_q, block_k, interpret):
    out = _flash_forward(q, k, v, key_mask, scale=scale, block_q=block_q,
                         block_k=block_k, interpret=interpret)
    return out, (q, k, v, key_mask)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    # Backward recomputes attention through the XLA expression; the Pallas
    # kernel is forward-only for now (a blockwise dq/dk/dv kernel is a later
    # perf-pass item). Memory is O(N^2) per (b, h) during backward only.
    q, k, v, key_mask = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, key_mask, scale),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_with_vjp.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q,
    k,
    v,
    key_mask=None,
    *,
    scale: float | None = None,
    block_q: int = 1024,
    block_k: int = 512,
    interpret: bool = False,
):
    """Flash attention over (B, N, H, Dh) -> (B, N, H, Dh). Differentiable
    (custom VJP; backward recomputes via XLA)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_with_vjp(q, k, v, key_mask, scale, block_q, block_k, interpret)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def _flash_forward(
    q,
    k,
    v,
    key_mask=None,
    *,
    scale: float | None = None,
    block_q: int = 1024,
    block_k: int = 512,
    interpret: bool = False,
):
    """Flash attention forward over (B, N, H, Dh) -> (B, N, H, Dh)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, nq, h, d = q.shape
    nk = k.shape[1]
    # Block auto-tuning (measured on v5e at the fusion/tower shapes): large
    # q blocks + a single KV pass win whenever the (block_q, nk) f32 score
    # tile fits comfortably in VMEM — the inner fori_loop then runs once and
    # the kernel is two big MXU matmuls per grid step.
    block_q = min(block_q, max(128, 1 << (nq - 1).bit_length()))
    nk_pad128 = -(-nk // 128) * 128
    if block_q * nk_pad128 * 4 <= 8 * 1024 * 1024:
        block_k = nk_pad128
    else:
        block_k = min(block_k, max(128, 1 << (nk - 1).bit_length()))

    if key_mask is None:
        key_mask = jnp.ones((b, nk), jnp.int32)
    key_mask = key_mask.astype(jnp.int32)

    # (B, N, H, D) -> (B*H, N, D)
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * x.shape[2], x.shape[1], d)

    qb = _pad_to(to_bh(q), 1, block_q)
    kb = _pad_to(to_bh(k), 1, block_k)
    vb = _pad_to(to_bh(v), 1, block_k)
    # (B*H, 1, nk_pad): kept 3-D so the mask block's trailing dims equal the
    # array dims (TPU requires trailing block dims divisible by (8, 128) OR
    # equal to the array's — a (1, nk) 2-D block satisfies neither).
    maskb = jnp.repeat(_pad_to(key_mask, 1, block_k), h, axis=0)[:, None, :]

    nq_pad, nk_pad = qb.shape[1], kb.shape[1]
    grid = (b * h, nq_pad // block_q)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k, kv_len=nk_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, d), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, d), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk_pad), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_pad, d), q.dtype),
        interpret=interpret,
    )(qb, kb, vb, maskb)

    out = out[:, :nq].reshape(b, h, nq, d).transpose(0, 2, 1, 3)
    return out

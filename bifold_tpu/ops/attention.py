"""Attention primitives: one entry point, swappable XLA / Pallas-flash backends.

All transformer stacks in bifold-tpu (SigLIP/CLIP towers, fusion transformer,
MAE decoder heads) funnel through :func:`dot_product_attention`, so the Pallas
flash kernel drops in everywhere at once. Layout is (B, N, H, Dh)
(batch, tokens, heads, head_dim) — the TPU-friendly layout XLA prefers for
fusing the surrounding projections.

Masking: ``key_mask`` (B, N) zeroes attention *to* padded tokens — the correct
semantics. The reference instead masks over the *query* dimension
(/root/reference/bifold/models/transformer.py:33-35 fills
``dots[mask_query==0, :] = -1e5``, a quirk: softmax over keys then re-weights
padded-query rows uniformly, and padded *keys* still leak into every query).
``legacy_query_mask=True`` reproduces that behavior for reference-parity
experiments; the default is the correct key masking (deviation documented in
SURVEY.md §7 "reference quirks").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["dot_product_attention"]

_NEG = -100000.0  # reference uses -1e5 rather than -inf for stability


def _xla_attention(q, k, v, key_mask, legacy_query_mask, scale, causal):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if legacy_query_mask is not None:
        # reference quirk: fill along the *query* axis
        logits = jnp.where(legacy_query_mask[:, None, :, None] == 0, _NEG, logits)
    if key_mask is not None:
        logits = jnp.where(key_mask[:, None, None, :] == 0, _NEG, logits)
    if causal:
        nq, nk = logits.shape[-2], logits.shape[-1]
        tri = jnp.tril(jnp.ones((nq, nk), bool))
        logits = jnp.where(tri[None, None], logits, _NEG)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v), probs


def dot_product_attention(
    q,
    k,
    v,
    key_mask=None,
    *,
    legacy_query_mask=None,
    causal: bool = False,
    scale: float | None = None,
    backend: str = "auto",
    return_weights: bool = False,
):
    """Multi-head attention over (B, N, H, Dh) tensors.

    ``backend``: "auto" picks the Pallas flash kernel on TPU for long
    sequences (and when attention weights aren't requested), else plain XLA.
    Softmax always accumulates in float32.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    import os
    env_backend = os.environ.get("BIFOLD_ATTN_BACKEND")

    # features the flash kernel does not implement; a forced backend must not
    # silently produce wrong attention for these calls (ADVICE r1 medium)
    unsupported = (causal or return_weights or legacy_query_mask is not None
                   or q.shape[1] != k.shape[1])
    if env_backend:
        # global env override: honor it only for calls the kernel supports
        # (the CLIP text tower is causal — it keeps the XLA path)
        backend = "xla" if (env_backend == "flash" and unsupported) else env_backend

    use_flash = False
    if backend == "flash":
        if unsupported:
            raise NotImplementedError(
                "backend='flash' does not support causal / return_weights / "
                "legacy_query_mask / cross-length attention; use backend="
                "'xla' or 'auto' for these calls")
        use_flash = True
    elif backend == "auto" and not unsupported:
        on_tpu = jax.default_backend() in ("tpu", "axon")
        # flash pays off once N is past a few hundred tokens
        use_flash = on_tpu and q.shape[1] >= 256 and q.shape[1] == k.shape[1]

    if use_flash:
        from bifold_tpu.ops.flash_attention import flash_attention

        # interpret mode lets CPU tests drive the REAL flash code path
        # (incl. its SPMD partitioning) without a TPU; parsed as a flag so
        # BIFOLD_FLASH_INTERPRET=0 on a real TPU stays on the compiled path
        interpret = os.environ.get("BIFOLD_FLASH_INTERPRET", "").lower() \
            not in ("", "0", "false")
        out = flash_attention(q, k, v, key_mask=key_mask, scale=scale,
                              interpret=interpret)
        return (out, None) if return_weights else out

    out, probs = _xla_attention(q, k, v, key_mask, legacy_query_mask, scale, causal)
    return (out, probs) if return_weights else out

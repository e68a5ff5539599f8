"""Cross-modal fusion: concat transformer and single-layer cross-attention.

Counterparts of /root/reference/bifold/models/fusion.py. Both add learned
token-type embeddings per modality; ConcatTransformer runs the shared
pre-norm stack over the concatenated [text | (context) | image] sequence and
returns the last modality's token slice, CrossAttention queries image tokens
against the other modalities.

Masking semantics: the reference feeds its padded-context attention mask in
over the *query* dimension (transformer.py:33-35) — see
bifold_tpu/ops/attention.py. Here ``attention_masks`` is applied as a proper
key mask by default; set ``legacy_query_mask=True`` on the module for
reference-parity mode.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from bifold_tpu.models.layers import MultiHeadAttention, Transformer, normal_init

__all__ = ["ConcatTransformer", "CrossAttention"]


class ConcatTransformer(nn.Module):
    dim: int
    heads: int
    depth: int
    dropout: float = 0.0
    mlp_ratio: int = 4
    num_modalities: int = 2
    num_registers: int = 0
    legacy_query_mask: bool = False
    # moe_experts > 0 swaps every block's dense FFN for a Switch-style MoE
    # (TPU-native capacity extension; the reference's fusion is dense)
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, *inputs, modalities: Optional[Sequence[int]] = None,
                 attention_masks=None, deterministic=True):
        if modalities is None:
            modalities = list(range(len(inputs)))
        assert len(inputs) == len(modalities)

        # keep the residual stream in the compute dtype: the f32 embedding
        # params would otherwise promote every concat token (and the whole
        # scan carry) to f32 — measured ~2x on the fusion loops
        type_emb = nn.Embed(self.num_modalities, self.dim, dtype=self.dtype,
                            embedding_init=normal_init, name="token_type_embeddings")

        concat = []
        if self.num_registers > 0:
            regs = self.param("registers", nn.initializers.normal(1.0),
                              (self.num_registers, self.dim))
            concat.append(jnp.broadcast_to(regs[None].astype(self.dtype),
                                           (inputs[0].shape[0], *regs.shape)))
        for mod, inp in zip(modalities, inputs):
            concat.append(inp.astype(self.dtype)
                          + type_emb(jnp.full((inp.shape[1],), mod, jnp.int32))[None])

        x = jnp.concatenate(concat, axis=1)
        key_mask = None
        legacy = None
        if attention_masks is not None:
            if self.num_registers > 0:
                ones = jnp.ones((x.shape[0], self.num_registers), attention_masks.dtype)
                attention_masks = jnp.concatenate([ones, attention_masks], axis=1)
            if self.legacy_query_mask:
                legacy = attention_masks
            else:
                key_mask = attention_masks

        x = Transformer(
            dim=self.dim, depth=self.depth, heads=self.heads,
            dim_head=self.dim // self.heads, mlp_dim=self.dim * self.mlp_ratio,
            fused_qkv=True, dropout=self.dropout, remat=self.remat,
            moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            ln_eps=1e-5,  # torch nn.LayerNorm default (reference modules.py:11)
            dtype=self.dtype, name="transformer_encoder",
        )(x, key_mask, legacy_query_mask=legacy, deterministic=deterministic)

        # features of the last modality (current image tokens)
        return x[:, -inputs[-1].shape[1]:, :], None


class CrossAttention(nn.Module):
    dim: int
    heads: int
    depth: int = 1  # accepted for config parity; a single MHA layer is used
    dropout: float = 0.0
    num_modalities: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, *inputs, modalities: Optional[Sequence[int]] = None,
                 attention_masks=None, deterministic=True):
        if modalities is None:
            modalities = list(range(len(inputs)))
        assert len(inputs) == len(modalities)

        type_emb = nn.Embed(self.num_modalities, self.dim, dtype=self.dtype,
                            embedding_init=normal_init, name="token_type_embeddings")
        conditions = [
            inp.astype(self.dtype)
            + type_emb(jnp.full((inp.shape[1],), mod, jnp.int32))[None]
            for mod, inp in zip(modalities[:-1], inputs[:-1])
        ]
        queries = inputs[-1].astype(self.dtype) + type_emb(
            jnp.full((inputs[-1].shape[1],), modalities[-1], jnp.int32)
        )[None]
        condition_tokens = jnp.concatenate(conditions, axis=1)

        key_mask = None
        if attention_masks is not None:
            key_mask = attention_masks[:, : condition_tokens.shape[1]]

        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dropout_rate=self.dropout, dtype=self.dtype,
            name="cross_attention",
        )
        mask = None
        if key_mask is not None:
            # (B, 1, Q, K) broadcastable mask
            mask = key_mask[:, None, None, :] > 0
        out = attn(queries, condition_tokens, condition_tokens, mask=mask,
                   deterministic=deterministic)
        return out, None

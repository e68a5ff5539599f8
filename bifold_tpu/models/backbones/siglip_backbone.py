"""SigLIP dual encoder (vision ViT + text transformer) in Flax.

From-scratch TPU implementation of the architecture behind
``google/siglip-base-patch16-{224,384}`` that the reference loads via HF
``AutoModel`` (/root/reference/bifold/models/siglip.py:27). Parameter tree is
laid out so :mod:`bifold_tpu.models.convert` can map HF torch checkpoints
onto it 1:1 when a local checkpoint is available (no network in deployment);
otherwise towers are randomly initialized.

Matches HF semantics the reference relies on:
- vision: conv patch embed (no cls token), learned pos embeds, pre-LN
  encoder with gelu-tanh MLPs, final post_layernorm ->
  ``last_hidden_state`` (B, P, D);
- text: token + learned pos embeds, same encoder, final_layer_norm ->
  (B, 64, D); *no* causal mask and no padding mask (SigLIP trains with
  padded full attention, and the reference passes no attention_mask);
- LoRA adapters on q/v projections when configured (siglip.py:33-40).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from bifold_tpu.models.layers import LayerNorm, Transformer, gelu_tanh

__all__ = ["SiglipConfig", "SiglipBackbone", "SIGLIP_BASE_CONFIGS"]


@dataclass(frozen=True)
class SiglipConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    vocab_size: int = 32000
    max_text_len: int = 64

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


SIGLIP_BASE_CONFIGS = {
    "google/siglip-base-patch16-224": SiglipConfig(image_size=224),
    "google/siglip-base-patch16-384": SiglipConfig(image_size=384),
    # test/smoke config: genuinely small towers (unknown names previously fell
    # back to the 12-layer base, making "tiny" runs 12-deep at small width)
    "tiny": SiglipConfig(layers=2, heads=4, mlp_dim=256),
}


def _tower(cfg: SiglipConfig, lora_rank, lora_alpha, lora_dropout, remat, dtype, name):
    return Transformer(
        dim=cfg.hidden_size,
        depth=cfg.layers,
        heads=cfg.heads,
        mlp_dim=cfg.mlp_dim,
        dim_head=cfg.hidden_size // cfg.heads,
        fused_qkv=False,
        activation=gelu_tanh,  # gelu_pytorch_tanh; custom VJP saves only x
        lora_rank=lora_rank,
        lora_alpha=lora_alpha,
        lora_dropout=lora_dropout,
        remat=remat,
        dtype=dtype,
        name=name,
    )


class SiglipVisionTower(nn.Module):
    cfg: SiglipConfig
    lora_rank: int = 0
    lora_alpha: float = 1.0
    lora_dropout: float = 0.0
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values, deterministic=True):
        """pixel_values: (B, C, H, W) normalized floats -> (B, P, D)."""
        cfg = self.cfg
        x = jnp.transpose(pixel_values, (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embedding",
        )(x)
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.hidden_size)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.num_patches, cfg.hidden_size),
        )
        x = x + pos[None].astype(self.dtype)
        x = _tower(cfg, self.lora_rank, self.lora_alpha, self.lora_dropout,
                   self.remat, self.dtype, "encoder")(x, deterministic=deterministic)
        return LayerNorm(dtype=self.dtype, name="post_layernorm")(x)


class SiglipTextTower(nn.Module):
    cfg: SiglipConfig
    lora_rank: int = 0
    lora_alpha: float = 1.0
    lora_dropout: float = 0.0
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, deterministic=True):
        """input_ids: (B, L) int32 -> (B, L, D)."""
        cfg = self.cfg
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                       embedding_init=nn.initializers.normal(0.02),
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.max_text_len, cfg.hidden_size),
        )
        x = tok.astype(self.dtype) + pos[None, : input_ids.shape[1]].astype(self.dtype)
        x = _tower(cfg, self.lora_rank, self.lora_alpha, self.lora_dropout,
                   self.remat, self.dtype, "encoder")(x, deterministic=deterministic)
        return LayerNorm(dtype=self.dtype, name="final_layer_norm")(x)


class SiglipBackbone(nn.Module):
    """Joint callable mirroring the reference's
    ``siglip_model(input_ids=..., pixel_values=...)`` (siglip.py:87) plus a
    vision-only entry point for context frames (siglip.py:102-104)."""

    cfg: SiglipConfig
    lora_rank: int = 0
    lora_alpha: float = 1.0
    lora_dropout: float = 0.0
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        kw = dict(
            cfg=self.cfg, lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            lora_dropout=self.lora_dropout, remat=self.remat, dtype=self.dtype,
        )
        self.vision_model = SiglipVisionTower(**kw)
        self.text_model = SiglipTextTower(**kw)

    def __call__(self, input_ids, pixel_values, deterministic=True):
        return (
            self.text_model(input_ids, deterministic=deterministic),
            self.vision_model(pixel_values, deterministic=deterministic),
        )

    def encode_image(self, pixel_values, deterministic=True):
        return self.vision_model(pixel_values, deterministic=deterministic)

    def encode_text(self, input_ids, deterministic=True):
        return self.text_model(input_ids, deterministic=deterministic)

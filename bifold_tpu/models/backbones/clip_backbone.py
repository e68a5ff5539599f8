"""CLIP dual encoder (ViT vision + causal text transformer) in Flax.

From-scratch TPU implementation of the OpenAI CLIP architecture the reference
vendors (/root/reference/bifold/models/clip/model.py). Only the ViT variants
are provided (the shipped configs use ViT-B/16; the ModifiedResNet path is
covered by the text_unet model's pooled-text encoder instead). Exposes the
token-level outputs the reference adds to stock CLIP:

- ``encode_image_with_embeddings``: ln_post over ALL tokens, no projection
  (model.py:296-317) -> (B, P+1, vision_width);
- ``encode_text_with_embeddings``: ln_final token sequence, pre-projection
  (model.py:447-461) -> (B, 77, text_width);
- ``encode_text``: pooled EOT embedding @ text_projection (for text_unet's
  FiLM conditioning).

QuickGELU activations and causal text masking match CLIP.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from bifold_tpu.models.layers import LayerNorm, Transformer

__all__ = ["ClipConfig", "ClipBackbone", "CLIP_CONFIGS", "CLIP_TEXT_CONFIGS"]


@jax.custom_vjp
def quick_gelu(x):
    return _quick_gelu_fwd(x)[0]


def _quick_gelu_fwd(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype), x


def _quick_gelu_bwd(x, dy):
    # residual-lean (see layers.py): save x only, recompute sigmoid in bwd
    xf = x.astype(jnp.float32)
    s = jax.nn.sigmoid(1.702 * xf)
    return ((dy.astype(jnp.float32) * (s + 1.702 * xf * s * (1 - s))).astype(x.dtype),)


quick_gelu.defvjp(_quick_gelu_fwd, _quick_gelu_bwd)


@dataclass(frozen=True)
class ClipConfig:
    image_size: int = 224
    patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    context_length: int = 77
    vocab_size: int = 49408
    embed_dim: int = 512

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


CLIP_CONFIGS = {
    "ViT-B/16": ClipConfig(patch_size=16),
    "ViT-B/32": ClipConfig(patch_size=32),
    "ViT-L/14": ClipConfig(
        patch_size=14, vision_width=1024, vision_layers=24, vision_heads=16,
        text_width=768, text_heads=12, embed_dim=768,
    ),
    # same towers as ViT-L/14 at 336 px input (the reference's _MODELS last
    # entry); its text side is identical, so text_unet dispatch must accept
    # it as a CLIP name rather than routing it to the T5 branch
    "ViT-L/14@336px": ClipConfig(
        image_size=336, patch_size=14, vision_width=1024, vision_layers=24,
        vision_heads=16, text_width=768, text_heads=12, embed_dim=768,
    ),
}

# Text-tower-only configs for the ResNet-vision CLIP names in the
# reference's _MODELS (clip/clip.py). Only the encode_text* paths are valid
# under these — the ModifiedResNet vision tower is not implemented, and
# text_unet (the sole consumer, text_unet.py:104-108) never touches it.
# Text-side constants are the public CLIP release values (the reference's
# clip.load re-derives heads as width//64). text_projection is created but
# never consumed by text_unet (it pools PRE-projection); convert_text_unet
# round-trips list it allowed-missing.
CLIP_TEXT_CONFIGS = {
    "RN50": ClipConfig(embed_dim=1024),
    "RN101": ClipConfig(embed_dim=512),
    "RN50x4": ClipConfig(text_width=640, text_heads=10, embed_dim=640),
    "RN50x16": ClipConfig(text_width=768, text_heads=12, embed_dim=768),
    "RN50x64": ClipConfig(text_width=1024, text_heads=16, embed_dim=1024),
}


class ClipVisionTower(nn.Module):
    cfg: ClipConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values, deterministic=True):
        """(B, C, H, W) -> all-token features (B, P+1, W_v) after ln_post."""
        cfg = self.cfg
        x = jnp.transpose(pixel_values, (0, 2, 3, 1)).astype(self.dtype)
        x = nn.Conv(
            cfg.vision_width, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.vision_width)
        cls = self.param("class_embedding",
                         nn.initializers.normal(cfg.vision_width**-0.5),
                         (cfg.vision_width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (b, 1, cfg.vision_width)).astype(self.dtype), x],
            axis=1,
        )
        pos = self.param("positional_embedding",
                         nn.initializers.normal(cfg.vision_width**-0.5),
                         (cfg.num_patches + 1, cfg.vision_width))
        x = x + pos[None].astype(self.dtype)
        x = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        x = Transformer(
            dim=cfg.vision_width, depth=cfg.vision_layers, heads=cfg.vision_heads,
            mlp_dim=cfg.vision_width * 4, fused_qkv=False, activation=quick_gelu,
            ln_eps=1e-5, dtype=self.dtype, name="transformer",
        )(x, deterministic=deterministic)
        return LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x)


class ClipTextTower(nn.Module):
    cfg: ClipConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.token_embedding = nn.Embed(
            cfg.vocab_size, cfg.text_width,
            embedding_init=nn.initializers.normal(0.02), name="token_embedding")
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.text_width))
        self.transformer = Transformer(
            dim=cfg.text_width, depth=cfg.text_layers, heads=cfg.text_heads,
            mlp_dim=cfg.text_width * 4, fused_qkv=False, causal=True,
            activation=quick_gelu, ln_eps=1e-5, dtype=self.dtype,
            name="transformer")
        self.ln_final = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")
        self.text_projection = self.param(
            "text_projection", nn.initializers.normal(cfg.text_width**-0.5),
            (cfg.text_width, cfg.embed_dim))

    def _encode(self, input_ids, deterministic):
        x = self.token_embedding(input_ids).astype(self.dtype)
        x = x + self.positional_embedding[None, : input_ids.shape[1]].astype(self.dtype)
        x = self.transformer(x, deterministic=deterministic)
        return self.ln_final(x)

    def encode_with_embeddings(self, input_ids, deterministic=True):
        return self._encode(input_ids, deterministic)

    def encode_pooled(self, input_ids, deterministic=True):
        x = self._encode(input_ids, deterministic)
        eot = jnp.argmax(input_ids, axis=-1)  # EOT is the highest token id
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        return pooled @ self.text_projection.astype(pooled.dtype)


class ClipBackbone(nn.Module):
    """Vision + text towers with the token-level entry points the reference's
    vendored CLIP exposes (model.py:296-317, 447-461)."""

    cfg: ClipConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.visual = ClipVisionTower(cfg=self.cfg, dtype=self.dtype)
        self.text = ClipTextTower(cfg=self.cfg, dtype=self.dtype)

    def __call__(self, input_ids, pixel_values, deterministic=True):
        return (
            self.text.encode_with_embeddings(input_ids, deterministic),
            self.visual(pixel_values, deterministic),
        )

    def encode_image_with_embeddings(self, pixel_values, deterministic=True):
        return self.visual(pixel_values, deterministic)

    def encode_text_with_embeddings(self, input_ids, deterministic=True):
        return self.text.encode_with_embeddings(input_ids, deterministic)

    def encode_text(self, input_ids, deterministic=True):
        return self.text.encode_pooled(input_ids, deterministic)

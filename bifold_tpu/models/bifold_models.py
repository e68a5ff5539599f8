"""The four BiFold model families as Flax modules.

Counterparts of /root/reference/bifold/models/{siglip,rgb_clip,text_unet}.py.
Each model consumes the processor's sample dict and returns the reference's
heatmap dict (keys: {left_,right_,}pick/place_heatmap, optional mask_heatmap,
attn_weights). Backbones run in the configured compute dtype; heads in
float32.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from bifold_tpu.models.backbones import (
    CLIP_CONFIGS,
    CLIP_TEXT_CONFIGS,
    ClipBackbone,
    SIGLIP_BASE_CONFIGS,
    SiglipBackbone,
    SiglipConfig,
    T5Encoder,
    resolve_t5_config,
)
from bifold_tpu.models.layers import normal_init
from bifold_tpu.models.pickplace import PickPlaceConvDecoder, PickPlaceTransDecoder

__all__ = ["SigLip", "SiglipSequential", "RGBOnly", "TextConditionedUNet"]


def _pick_place(pick_place_model, dim, is_bimanual, num_patches, patch_size,
                fusion_model, fusion_kwargs, dtype, **extra):
    if pick_place_model == "pick_place_convdecoder":
        return PickPlaceConvDecoder(
            dim=dim, is_bimanual=is_bimanual, fusion_model=fusion_model,
            num_patches=num_patches, patch_size=patch_size,
            fusion_kwargs=fusion_kwargs, dtype=dtype, name="pick_place", **extra)
    if pick_place_model == "pick_place_transdecoder":
        return PickPlaceTransDecoder(
            dim=dim, is_bimanual=is_bimanual, fusion_model=fusion_model,
            num_patches=num_patches, patch_size=patch_size,
            fusion_kwargs=fusion_kwargs, dtype=dtype, name="pick_place", **extra)
    raise ValueError(f"Unknown pick_place_model {pick_place_model!r}")


class SigLip(nn.Module):
    """SigLIP dual encoder + learned modality tokens + fused pick/place head
    (reference siglip.py:10-71)."""

    image_size: int
    is_bimanual: bool
    patch_size: int = 16
    automodel_name: str = "google/siglip-base-patch16-224"
    dim: int = 768
    emb_dropout: float = 0.0
    lora: bool = True
    r: int = 8
    lora_alpha: float = 32.0
    lora_dropout: float = 0.01
    target_modules: Tuple[str, ...] = ("q_proj", "v_proj")
    threshold: float = 0.5
    text_encoder: Optional[str] = None
    pick_place_model: str = "pick_place_convdecoder"
    fusion_model: str = "concat_transformer"
    depth: int = 8
    heads: int = 16
    mlp_ratio: int = 4
    dropout: float = 0.0
    # fusion-FFN Mixture-of-Experts (TPU-native capacity extension; 0 = the
    # reference's dense FFN). moe_aux_weight scales the Switch load-balance
    # loss the train step adds (parallel.make_train_step).
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 0.01
    requires_graph: bool = False
    constrain_pick_mask: bool = True
    legacy_query_mask: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    def _backbone(self):
        base = SIGLIP_BASE_CONFIGS.get(self.automodel_name, SiglipConfig())
        cfg = SiglipConfig(
            image_size=self.image_size, patch_size=self.patch_size,
            hidden_size=self.dim, layers=base.layers, heads=base.heads,
            mlp_dim=base.mlp_dim, vocab_size=base.vocab_size,
            max_text_len=base.max_text_len,
        )
        return SiglipBackbone(
            cfg=cfg,
            lora_rank=self.r if self.lora else 0,
            lora_alpha=self.lora_alpha,
            lora_dropout=self.lora_dropout,
            remat=self.remat,
            dtype=self.dtype,
            name="siglip_model",
        )

    def _fusion_kwargs(self):
        return dict(heads=self.heads, depth=self.depth, dropout=self.dropout,
                    mlp_ratio=self.mlp_ratio,
                    moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
                    moe_capacity_factor=self.moe_capacity_factor,
                    legacy_query_mask=self.legacy_query_mask, remat=self.remat)

    def _head(self):
        return _pick_place(
            self.pick_place_model, self.dim, self.is_bimanual, self.num_patches,
            self.patch_size, self.fusion_model, self._fusion_kwargs(), self.dtype)

    @nn.compact
    def __call__(self, sample, deterministic: bool = True):
        backbone = self._backbone()
        text_feats, image_feats = backbone(
            sample["instruction"], sample["rgb"], deterministic=deterministic)

        image_token = self.param("image_token", nn.initializers.normal(1.0),
                                 (1, 1, self.dim))
        text_token = self.param("text_token", nn.initializers.normal(1.0),
                                (1, 1, self.dim))
        b = image_feats.shape[0]
        image_feats = jnp.concatenate(
            [jnp.broadcast_to(image_token, (b, 1, self.dim)).astype(image_feats.dtype),
             image_feats], axis=1)
        text_feats = jnp.concatenate(
            [jnp.broadcast_to(text_token, (b, 1, self.dim)).astype(text_feats.dtype),
             text_feats], axis=1)

        return self._head()(text_feats, image_feats, deterministic=deterministic)


class SiglipSequential(SigLip):
    """SigLip + temporal context frames through the shared vision tower with
    learned context position embeddings (reference siglip.py:73-137)."""

    context_length: int = 3

    @nn.compact
    def __call__(self, sample, deterministic: bool = True):
        backbone = self._backbone()
        b = sample["rgb"].shape[0]

        if "rgb_context" not in sample:
            raise KeyError(
                "siglip_sequential needs context frames (rgb_context / "
                "context_attention_mask) — use a *_sequential dataset or set "
                "train_dataset.max_context_length > 0; for context-free "
                "training use model=siglip")
        # current + context frames run through the shared vision tower as ONE
        # batched pass of B*(T+1) frames (the reference encodes them in two:
        # siglip.py:87,102-104 — same math, but separate launches halve the
        # per-call batch and double every tower kernel's fixed cost; measured
        # 3.7 -> 2.4 ms per attention layer on v5e at the flagship shape)
        ctx = sample["rgb_context"]
        t = ctx.shape[1]
        frames = jnp.concatenate([sample["rgb"][:, None], ctx], axis=1)
        frames_flat = frames.reshape(b * (t + 1), *ctx.shape[2:])
        frame_feats = backbone.encode_image(frames_flat, deterministic=deterministic)
        frame_feats = frame_feats.reshape(b, t + 1, frame_feats.shape[1], self.dim)
        image_feats = frame_feats[:, 0]
        text_feats = backbone.encode_text(
            sample["instruction"], deterministic=deterministic)

        image_token = self.param("image_token", nn.initializers.normal(1.0),
                                 (1, 1, self.dim))
        text_token = self.param("text_token", nn.initializers.normal(1.0),
                                (1, 1, self.dim))
        image_feats = jnp.concatenate(
            [jnp.broadcast_to(image_token, (b, 1, self.dim)).astype(image_feats.dtype),
             image_feats], axis=1)
        n = image_feats.shape[1]
        text_feats = jnp.concatenate(
            [jnp.broadcast_to(text_token, (b, 1, self.dim)).astype(text_feats.dtype),
             text_feats], axis=1)
        n_txt = text_feats.shape[1]

        ctx_feats = frame_feats[:, 1:]
        ctx_feats = jnp.concatenate(
            [jnp.broadcast_to(image_token[None], (b, t, 1, self.dim)).astype(ctx_feats.dtype),
             ctx_feats], axis=2)
        ctx_feats = ctx_feats.reshape(b, t * n, self.dim)
        context_pos = self.param(
            "context_pos_embedding", nn.initializers.normal(1.0),
            (1, self.context_length * (self.num_patches + 1), self.dim))
        ctx_feats = ctx_feats + context_pos[:, : t * n].astype(ctx_feats.dtype)

        # [text ones | context mask per-frame-expanded | current ones]
        ctx_mask = sample["context_attention_mask"]  # (B, T)
        attention_masks = jnp.concatenate(
            [jnp.ones((b, n_txt), jnp.int32),
             jnp.repeat(ctx_mask.astype(jnp.int32), n, axis=1),
             jnp.ones((b, n), jnp.int32)], axis=1)

        return self._head()(
            text_feats, ctx_feats, image_feats,
            modalities=[0, 1, 1], attention_masks=attention_masks,
            deterministic=deterministic)


class RGBOnly(nn.Module):
    """Frozen CLIP token encoders + projection + shared pick/place head
    (reference rgb_clip.py:9-80)."""

    image_size: int
    is_bimanual: bool
    patch_size: int = 16
    text_encoder: str = "ViT-B/16"
    text_dropout: float = 0.0
    rgb_dropout: float = 0.0
    threshold: float = 0.5
    pick_place_model: str = "pick_place_convdecoder"
    fusion_model: str = "concat_transformer"
    depth: int = 8
    heads: int = 16
    mlp_ratio: int = 4
    dropout: float = 0.0
    requires_graph: bool = False
    constrain_pick_mask: bool = True
    legacy_query_mask: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @nn.compact
    def __call__(self, sample, deterministic: bool = True):
        if self.text_encoder not in CLIP_CONFIGS:
            # ViT-only is reference-faithful: the reference's RGBOnly reads
            # `visual.ln_post` (rgb_clip.py:34), which the RN* ModifiedResNet
            # towers don't have — it AttributeErrors there too. Raise the
            # same loud-name convention as text_unet's resolve paths.
            raise ValueError(
                f"rgb_clip text_encoder={self.text_encoder!r} is not a ViT "
                f"CLIP model; supported: {sorted(CLIP_CONFIGS)} (the "
                "reference crashes on RN* here too — its RGBOnly reads "
                "visual.ln_post, which ModifiedResNet lacks)")
        clip_cfg = CLIP_CONFIGS[self.text_encoder]
        clip_cfg = type(clip_cfg)(**{**clip_cfg.__dict__, "image_size": self.image_size})
        clip = ClipBackbone(cfg=clip_cfg, dtype=self.dtype, name="clip_encoder")
        dim = clip_cfg.text_width

        x_rgb = clip.encode_image_with_embeddings(sample["rgb"], deterministic)
        x_rgb = nn.Dense(dim, dtype=self.dtype, name="project")(x_rgb)
        rgb_pos = self.param("rgb_pos_embedding", nn.initializers.normal(1.0),
                             (1, self.num_patches + 1, dim))
        x_rgb = x_rgb + rgb_pos.astype(x_rgb.dtype)
        if self.rgb_dropout > 0:
            x_rgb = nn.Dropout(self.rgb_dropout)(x_rgb, deterministic=deterministic)

        x_text = clip.encode_text_with_embeddings(sample["instruction"], deterministic)
        text_token = self.param("text_token", nn.initializers.normal(1.0), (1, 1, dim))
        b, n_txt, _ = x_text.shape
        x_text = jnp.concatenate(
            [jnp.broadcast_to(text_token, (b, 1, dim)).astype(x_text.dtype), x_text],
            axis=1)
        text_pos = self.param("text_pos_embedding", nn.initializers.normal(1.0),
                              (1, clip_cfg.context_length + 1, dim))
        x_text = x_text + text_pos[:, : n_txt + 1].astype(x_text.dtype)
        if self.text_dropout > 0:
            x_text = nn.Dropout(self.text_dropout)(x_text, deterministic=deterministic)

        head = _pick_place(
            self.pick_place_model, dim, self.is_bimanual, self.num_patches,
            self.patch_size, self.fusion_model,
            dict(heads=self.heads, depth=self.depth, dropout=self.dropout,
                 mlp_ratio=self.mlp_ratio,
                 legacy_query_mask=self.legacy_query_mask, remat=self.remat),
            self.dtype)
        return head(x_text, x_rgb, deterministic=deterministic)


class _FiLMBlock(nn.Module):
    """Transposed-conv upsample + skip concat + double conv + FiLM modulation
    (reference text_unet.py:22-45). NHWC; BatchNorm uses the ``batch_stats``
    collection."""

    in_channels: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, condition, deterministic=True):
        x1 = nn.ConvTranspose(self.in_channels // 2, (2, 2), strides=(2, 2),
                              dtype=self.dtype, name="convt")(x1)
        x = jnp.concatenate([x2, x1], axis=-1)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype,
                         name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(x)
        x = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype,
                         name="bn2")(x)
        gamma = nn.Dense(self.out_channels, name="film_gamma")(condition)
        beta = nn.Dense(self.out_channels, name="film_beta")(condition)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="film_conv")(x) * (1 + gamma[:, None, None, :]) + beta[:, None, None, :]
        return nn.relu(x)


class TextConditionedUNet(nn.Module):
    """Depth-image UNet with FiLM-modulated decoder blocks conditioned on a
    pooled frozen-CLIP text embedding (reference text_unet.py:47-140)."""

    image_size: int
    is_bimanual: bool
    text_encoder: str = "RN50"
    features: Tuple[int, ...] = (64, 128, 256, 512, 1024)
    threshold: float = 0.5
    requires_graph: bool = False
    constrain_pick_mask: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sample, deterministic: bool = True):
        # Reference dispatch (text_unet.py:52-60): CLIP model names get the
        # vendored CLIP text tower; anything else is treated as a T5
        # checkpoint (T5EncoderModel.from_pretrained). RN50's CLIP text
        # tower: width 512, 12 layers, 8 heads — only the text side is used
        # (text_unet.py:104-108), so no ResNet tower is needed.
        clip_cfg = (CLIP_CONFIGS.get(self.text_encoder)
                    or CLIP_TEXT_CONFIGS.get(self.text_encoder))
        if clip_cfg is not None:
            clip = ClipBackbone(cfg=clip_cfg, dtype=self.dtype,
                                name="clip_encoder")
            cond = clip.encode_text_with_embeddings(
                sample["instruction"], deterministic)
            eot = jnp.argmax(sample["instruction"], axis=-1)
            cond = jnp.take_along_axis(cond, eot[:, None, None], axis=1)[:, 0]
        else:
            # loud on unknown names: resolve_t5_config raises ValueError
            # unless this is a known T5 config or a local T5 checkpoint dir
            t5 = T5Encoder(cfg=resolve_t5_config(self.text_encoder),
                           dtype=self.dtype, name="text_encoder")
            # T5 pooling = first token of last_hidden_state (text_unet.py:107)
            cond = t5(sample["instruction"], deterministic)[:, 0]
        cond = jax.lax.stop_gradient(cond)  # reference encodes text under no_grad

        x = jnp.transpose(sample["depth"], (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        skips = []
        feats = list(self.features)
        for i, f in enumerate(feats):
            if i != 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for j in range(2):
                x = nn.Conv(f, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                            name=f"enc{i}_conv{j}")(x)
                x = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype,
                                 name=f"enc{i}_bn{j}")(x)
                x = nn.relu(x)
            if i < len(feats) - 1:
                skips.append(x)

        for i in range(len(feats) - 2, -1, -1):
            x = _FiLMBlock(in_channels=feats[i + 1], out_channels=feats[i],
                           dtype=self.dtype, name=f"dec{len(feats) - 2 - i}")(
                x, skips[i], cond, deterministic=deterministic)

        out = {}
        names = (["left_pick", "right_pick", "left_place", "right_place"]
                 if self.is_bimanual else ["pick", "place"])
        for nme in names:
            hm = nn.Dense(1, dtype=jnp.float32, name=f"{nme}_decoder")(
                x.astype(jnp.float32))
            out[f"{nme}_logits"] = hm[..., 0]
            out[f"{nme}_heatmap"] = jax.nn.sigmoid(hm[..., 0])
        return out


"""Pick/place heads: fusion + per-head decoders -> sigmoid heatmaps.

Counterparts of /root/reference/bifold/models/pickplace.py. Output dict keys
match the reference exactly ({left_,right_,}pick/place_heatmap [+
mask_heatmap, attn_weights]) so losses/metrics/evaluators are drop-in.
Heatmaps are returned in float32 (B, H, W).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from bifold_tpu.models.decoders import ConvDecoder, TransformerDecoder, unpatchify
from bifold_tpu.models.fusion import ConcatTransformer, CrossAttention

__all__ = ["PickPlaceConvDecoder", "PickPlaceTransDecoder", "FUSIONS"]

FUSIONS = {"concat_transformer": ConcatTransformer, "crossattention": CrossAttention}


def _build_fusion(fusion_model, dim, kwargs, dtype, name):
    cls = FUSIONS[fusion_model]
    valid = set(cls.__dataclass_fields__) - {"dim", "dtype", "name", "parent"}
    accepted = {k: v for k, v in kwargs.items() if k in valid}
    return cls(dim=dim, dtype=dtype, name=name, **accepted)


class PickPlaceConvDecoder(nn.Module):
    """Fusion -> reshape last-modality patch tokens to (B, √P, √P, D) ->
    ConvDecoder per head (reference pickplace.py:10-124). The patch token
    prepended by the backbone is dropped before unflattening."""

    dim: int
    is_bimanual: bool
    fusion_model: str
    num_patches: int
    patch_size: int
    compute_mask: bool = False
    detach_mask: bool = False
    fusion_kwargs: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, *inputs, modalities=None, attention_masks=None,
                 deterministic=True):
        out = {}
        kw = dict(self.fusion_kwargs or {})
        fusion = _build_fusion(self.fusion_model, self.dim, kw, self.dtype, "fusion")
        fused, out["attn_weights"] = fusion(
            *inputs, modalities=modalities, attention_masks=attention_masks,
            deterministic=deterministic,
        )

        sqrt_p = int(self.num_patches**0.5)

        def to_grid(tokens):
            # drop the prepended summary token, then (B, P, D) -> (B, √P, √P, D)
            t = tokens[:, 1:, :]
            return t.reshape(t.shape[0], sqrt_p, sqrt_p, t.shape[-1])

        def head(name, feats):
            # rematerialized by default: the decoder is 5 pointwise matmuls
            # (cheap to recompute) but its f32 activation pyramid up to
            # (B, H*W, C) dominates training memory at full resolution.
            # BIFOLD_HEAD_REMAT=0 trades that memory back for one less
            # forward pass per head (A/B lever, read at trace time).
            import os
            remat = os.environ.get("BIFOLD_HEAD_REMAT", "1").lower() \
                not in ("0", "false")
            dec = ConvDecoder(self.dim, 1, dtype=jnp.float32, name=name)
            if remat:
                hm = nn.remat(lambda mdl, x: mdl(x))(dec, feats)
            else:
                hm = dec(feats)
            return hm[..., 0].astype(jnp.float32)  # logits

        mask_hm = None
        if self.compute_mask:
            mask_logits = head("mask_head", to_grid(inputs[-1].astype(jnp.float32)))
            mask_hm = jax.nn.sigmoid(mask_logits)
            out["mask_heatmap"] = mask_hm
            out["mask_logits"] = mask_logits
            if self.detach_mask:
                mask_hm = jax.lax.stop_gradient(mask_hm)

        grid = to_grid(fused.astype(jnp.float32))
        names = (
            ["left_pick", "right_pick", "left_place", "right_place"]
            if self.is_bimanual else ["pick", "place"]
        )
        for n in names:
            logits = head(f"{n}_decoder", grid)
            hm = jax.nn.sigmoid(logits)
            if mask_hm is not None and n.endswith("pick"):
                # probability-space gating (reference pickplace.py:95-99);
                # no logits emitted for gated heads — the loss falls back to
                # the probability path there
                hm = hm * mask_hm
            else:
                out[f"{n}_logits"] = logits
            out[f"{n}_heatmap"] = hm
        return out


class PickPlaceTransDecoder(nn.Module):
    """Separate pick/place fusions + MAE decoder heads + unpatchify
    (reference pickplace.py:127-263)."""

    dim: int
    is_bimanual: bool
    fusion_model: str
    num_patches: int
    patch_size: int
    decoder_embed_dim: int = 512
    decoder_num_heads: int = 16
    decoder_mlp_ratio: int = 4
    decoder_depth: int = 2
    compute_mask: bool = False
    detach_mask: bool = False
    condition_place_on_pick: bool = False
    fusion_kwargs: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, *inputs, modalities=None, attention_masks=None,
                 deterministic=True):
        out = {}
        kw = dict(self.fusion_kwargs or {})
        out_channels = 2 if self.is_bimanual else 1

        def fuse(name):
            fusion = _build_fusion(self.fusion_model, self.dim, kw, self.dtype, name)
            return fusion(*inputs, modalities=modalities,
                          attention_masks=attention_masks,
                          deterministic=deterministic)

        fused_pick, out["pick_attn_weights"] = fuse("pick_fusion")
        fused_place, out["place_attn_weights"] = fuse("place_fusion")

        def decoder(name):
            return TransformerDecoder(
                dim=self.dim, decoder_embed_dim=self.decoder_embed_dim,
                patch_size=self.patch_size, num_patches=self.num_patches,
                decoder_num_heads=self.decoder_num_heads,
                decoder_mlp_ratio=self.decoder_mlp_ratio,
                decoder_depth=self.decoder_depth, out_channels=out_channels,
                dtype=jnp.float32, name=name,
            )

        mask_hm = None
        if self.compute_mask:
            m = TransformerDecoder(
                dim=self.dim, decoder_embed_dim=self.decoder_embed_dim,
                patch_size=self.patch_size, num_patches=self.num_patches,
                decoder_num_heads=self.decoder_num_heads,
                decoder_mlp_ratio=self.decoder_mlp_ratio,
                decoder_depth=self.decoder_depth, out_channels=1,
                dtype=jnp.float32, name="mask_head",
            )(inputs[-1][:, : self.num_patches + 1].astype(jnp.float32),
              deterministic=deterministic)
            mask_hm = jax.nn.sigmoid(unpatchify(m, self.patch_size, 1)[:, 0])
            out["mask_heatmap"] = mask_hm
            if self.detach_mask:
                mask_hm = jax.lax.stop_gradient(mask_hm)

        pick = decoder("pick_decoder")(fused_pick.astype(jnp.float32),
                                       deterministic=deterministic)
        place = decoder("place_decoder")(fused_place.astype(jnp.float32),
                                         deterministic=deterministic)

        if self.condition_place_on_pick:
            fusion = _build_fusion(
                self.fusion_model, self.patch_size**2 * out_channels, kw,
                jnp.float32, "pick_place_fusion",
            )
            place, out["pick_place_attn_weights"] = fusion(
                pick, place, deterministic=deterministic
            )

        pick = unpatchify(pick, self.patch_size, out_channels)
        place = unpatchify(place, self.patch_size, out_channels)

        if self.is_bimanual:
            pairs = [("left", 0), ("right", 1)]
        else:
            pairs = [("", 0)]
        for prefix, idx in pairs:
            p = "" if not prefix else f"{prefix}_"
            pick_hm = jax.nn.sigmoid(pick[:, idx])
            if mask_hm is not None:
                pick_hm = mask_hm * pick_hm
            else:
                out[f"{p}pick_logits"] = pick[:, idx]
            out[f"{p}pick_heatmap"] = pick_hm
            out[f"{p}place_heatmap"] = jax.nn.sigmoid(place[:, idx])
            out[f"{p}place_logits"] = place[:, idx]
        return out

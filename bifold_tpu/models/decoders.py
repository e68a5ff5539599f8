"""Heatmap decoder heads: conv-upsample pyramid and MAE-style transformer.

Counterparts of /root/reference/bifold/models/modules.py:33-153, in NHWC
(TPU-native channel-last). The ConvDecoder's 1x1 convs are Dense layers on
the channel axis and the x2 bilinear upsamples are the same
matmul-resampling used by the data pipeline — the whole head is a chain of
MXU matmuls XLA fuses into a couple of kernels. Heads compute in float32
regardless of backbone dtype (heatmap fidelity is a parity requirement).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from bifold_tpu.models.layers import Transformer, get_2d_sincos_pos_embed

__all__ = ["ConvDecoder", "TransformerDecoder", "upsample2x"]


def _up2_along(x, axis: int):
    """x2 bilinear (align_corners=False) along one axis as a 2-tap stencil.

    For integer x2 the PIL/torch resample matrix has exactly two taps per
    output row — out[2i] = 0.25*x[i-1] + 0.75*x[i] and
    out[2i+1] = 0.75*x[i] + 0.25*x[i+1] with edge clamping (the clipped-window
    renormalization at the borders reduces to the clamp) — so the dense
    (2h, h) matmul form multiplies ~h/2x structural zeros. At the decoder's
    final 192->384 stage that is ~97% wasted f32 MXU work; the stencil is a
    fused elementwise pass at HBM bandwidth instead. Values are identical up
    to f32 rounding of the same two-term sums."""
    axis = axis % x.ndim
    h = x.shape[axis]

    def shift(lo, hi, edge_take):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(lo, hi)
        body = x[tuple(sl)]
        ed = [slice(None)] * x.ndim
        ed[axis] = edge_take
        edge = x[tuple(ed)]
        parts = (edge, body) if lo is None else (body, edge)
        return jnp.concatenate(parts, axis=axis)

    prev = shift(None, -1, slice(0, 1))      # x[max(i-1, 0)]
    nxt = shift(1, None, slice(h - 1, h))    # x[min(i+1, h-1)]
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    out = jnp.stack([even, odd], axis=axis + 1)  # (..., h, 2, ...)
    return out.reshape(x.shape[: axis] + (2 * h,) + x.shape[axis + 1 :])


def upsample2x(x):
    """Bilinear x2 upsample of (..., H, W, C), torch ``Upsample(scale=2,
    align_corners=False)`` semantics (reference modules.py:69)."""
    x = _up2_along(x, x.ndim - 3)
    return _up2_along(x, x.ndim - 2)


class ConvDecoder(nn.Module):
    """(B, h, w, C) -> (B, 16h, 16w, out): 5 pointwise convs, 4 bilinear x2
    upsamples interleaved (reference modules.py:33-75: C -> C/2 -> C/2 -> C/4
    -> C/4 -> out)."""

    input_dim: int
    output_dim: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c1 = self.input_dim // 2
        c2 = self.input_dim // 4
        chans = [c1, c1, c2, c2, self.output_dim]
        x = x.astype(self.dtype)
        for i, out_c in enumerate(chans):
            x = nn.Dense(out_c, dtype=self.dtype, name=f"conv{i}")(x)
            if i != 4:
                x = upsample2x(x)
        return x


class TransformerDecoder(nn.Module):
    """MAE-style decoder head (reference modules.py:77-153): linear embed,
    frozen 2-D sin-cos pos embed (with cls slot), ViT blocks, per-patch pixel
    prediction; the cls token is dropped from the output."""

    dim: int
    decoder_embed_dim: int
    patch_size: int
    num_patches: int
    decoder_num_heads: int
    decoder_mlp_ratio: int
    decoder_depth: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(self.decoder_embed_dim, dtype=self.dtype, name="decoder_embed")(x)
        pos = get_2d_sincos_pos_embed(
            self.decoder_embed_dim, int(self.num_patches**0.5), cls_token=True
        )
        x = x + jnp.asarray(pos, x.dtype)[None]
        x = Transformer(
            dim=self.decoder_embed_dim,
            depth=self.decoder_depth,
            heads=self.decoder_num_heads,
            mlp_dim=self.decoder_embed_dim * self.decoder_mlp_ratio,
            fused_qkv=False,
            dtype=self.dtype,
            name="blocks",
        )(x, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")(x)
        x = nn.Dense(self.patch_size**2 * self.out_channels, dtype=self.dtype,
                     name="decoder_pred")(x)
        return x[:, 1:, :]  # drop cls token


def unpatchify(x, patch_size: int, out_channels: int):
    """(B, h*w, p*p*c) -> (B, c, h*p, w*p) (reference pickplace.py:143-148)."""
    b, n, _ = x.shape
    hw = int(n**0.5)
    x = x.reshape(b, hw, hw, patch_size, patch_size, out_channels)
    x = x.transpose(0, 5, 1, 3, 2, 4)  # b c h p1 w p2
    return x.reshape(b, out_channels, hw * patch_size, hw * patch_size)

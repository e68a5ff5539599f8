"""Heatmap decoder heads: conv-upsample pyramid and MAE-style transformer.

Counterparts of /root/reference/bifold/models/modules.py:33-153, in NHWC
(TPU-native channel-last). The ConvDecoder's 1x1 convs are Dense layers on
the channel axis and the x2 bilinear upsamples are the same
matmul-resampling used by the data pipeline. Heads compute in float32
regardless of backbone dtype (heatmap fidelity is a parity requirement).

The reference pyramid (modules.py:33-75) has NO nonlinearity: it is 1x1
convs (channel-linear) interleaved with bilinear x2 upsamples
(pixel-linear, rows summing to exactly 1 so the conv bias passes through
unchanged). The two therefore commute, and the whole head collapses
algebraically: run all five Dense layers at the low (patch-grid)
resolution, then apply ONE composed n->16n bilinear matrix per axis (the
f64-accumulated product of the four x2 matrices — iterated x2 bilinear is
NOT the same as a direct x16 bilinear, so the matrices are composed, not
re-derived). Same mathematical function and identical param/checkpoint
layout, but ~8x fewer head MACs and no full-resolution multi-channel
intermediates (the interleaved form materializes (B, 16h, 16w, C/4) f32
tensors that dominated head HBM traffic). BIFOLD_CONVDEC=interleaved
restores the reference evaluation order for A/B (trace-time switch).
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from bifold_tpu.models.layers import Transformer, get_2d_sincos_pos_embed
from bifold_tpu.ops.image import resample_matrix

__all__ = ["ConvDecoder", "TransformerDecoder", "upsample2x"]


def upsample2x(x):
    """Bilinear x2 upsample of (..., H, W, C), torch ``Upsample(scale=2,
    align_corners=False)`` semantics, as two small matmuls."""
    h, w = x.shape[-3], x.shape[-2]
    rh = jnp.asarray(resample_matrix(h, 2 * h, "bilinear", antialias=False), x.dtype)
    rw = jnp.asarray(resample_matrix(w, 2 * w, "bilinear", antialias=False), x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", rh, x)
    x = jnp.einsum("ow,...hwc->...hoc", rw, x)
    return x


@lru_cache(maxsize=16)
def _up16_matrix(n: int) -> np.ndarray:
    """Composed n -> 16n matrix: the exact product of four x2 bilinear
    resample matrices (f64 accumulate, f32 result)."""
    r = np.eye(n, dtype=np.float64)
    m = n
    for _ in range(4):
        r = resample_matrix(m, 2 * m, "bilinear", antialias=False).astype(np.float64) @ r
        m *= 2
    return r.astype(np.float32)


class ConvDecoder(nn.Module):
    """(B, h, w, C) -> (B, 16h, 16w, out): 5 pointwise convs, 4 bilinear x2
    upsamples interleaved (reference modules.py:33-75: C -> C/2 -> C/2 -> C/4
    -> C/4 -> out). Evaluated in the collapsed order (see module docstring)
    unless BIFOLD_CONVDEC=interleaved."""

    input_dim: int
    output_dim: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c1 = self.input_dim // 2
        c2 = self.input_dim // 4
        chans = [c1, c1, c2, c2, self.output_dim]
        x = x.astype(self.dtype)
        interleaved = os.environ.get("BIFOLD_CONVDEC", "collapsed").lower() == "interleaved"
        for i, out_c in enumerate(chans):
            x = nn.Dense(out_c, dtype=self.dtype, name=f"conv{i}")(x)
            if interleaved and i != 4:
                x = upsample2x(x)
        if not interleaved:
            rh = jnp.asarray(_up16_matrix(x.shape[-3]), x.dtype)
            rw = jnp.asarray(_up16_matrix(x.shape[-2]), x.dtype)
            x = jnp.einsum("oh,...hwc->...owc", rh, x)
            x = jnp.einsum("ow,...hwc->...hoc", rw, x)
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

"""Heatmap -> action decoding: argmax, mask snapping, confidence gating.

TPU-native counterpart of the reference's per-sample numpy loop
(/root/reference/bifold/models/utils.py:60-83) and the bimanual gating logic
(/root/reference/bifold/models/__init__.py:119-141). Everything here is
jittable and batched — no host round-trips inside the serving path.

Pixel convention: returned pixels are ``[x, y]`` (column, row), matching the
reference's ``sample_from_heatmap``. The confidence is the heatmap value at
the (possibly mask-snapped) pixel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "DUMMY_PIXEL",
    "decode_heatmap",
    "nearest_to_mask",
    "gate_bimanual",
    "soft_argmax",
]

# Sentinel for "this arm does not act" (reference: bifold/env/__init__.py DUMMY_PICK)
DUMMY_PIXEL = -1.0


def nearest_to_mask(pixels_rc, mask):
    """Snap (B, 2) ``[row, col]`` pixels to the nearest True pixel of (B, H, W) mask.

    Jittable reformulation of the reference's argwhere/argmin scan
    (models/utils.py:80-83): argmin of squared distance over masked pixels,
    with unmasked pixels pushed to +inf. Ties resolve to the first flat index
    (row-major), matching numpy's argmin over argwhere ordering.

    An all-False mask row (cloth out of frame, segmentation failure) keeps
    the ORIGINAL pixel instead of silently snapping to the argmin-of-
    constant pixel (0, 0) — the reference's argwhere code would crash on an
    empty mask; inside a jitted batch we fall back to the unsnapped argmax
    so a perception failure degrades to "no snap", not a corner action.
    """
    b, h, w = mask.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    pr = pixels_rc[:, 0][:, None, None]
    pc = pixels_rc[:, 1][:, None, None]
    d2 = (rows[None] - pr) ** 2 + (cols[None] - pc) ** 2
    d2 = jnp.where(mask > 0, d2, jnp.iinfo(jnp.int32).max)
    flat_idx = jnp.argmin(d2.reshape(b, -1), axis=1)
    snapped = jnp.stack([flat_idx // w, flat_idx % w], axis=1)
    has_mask = jnp.any(mask > 0, axis=(1, 2))
    return jnp.where(has_mask[:, None], snapped,
                     pixels_rc.astype(snapped.dtype))


@partial(jax.jit, static_argnames=("use_mask",))
def decode_heatmap(heatmap, mask=None, *, use_mask: bool = False):
    """Decode (B, H, W) heatmaps to ``[x, y]`` pixels + confidences.

    With ``use_mask``, the argmax is snapped to the nearest mask-true pixel
    and the confidence re-read there, exactly like the reference
    (models/utils.py:60-77). Returns (pixels (B, 2) int32, conf (B,)).
    """
    b, h, w = heatmap.shape
    flat_idx = jnp.argmax(heatmap.reshape(b, -1), axis=1)
    rc = jnp.stack([flat_idx // w, flat_idx % w], axis=1)
    if use_mask:
        if mask is None:
            raise ValueError("use_mask=True requires a mask")
        rc = nearest_to_mask(rc, mask.reshape(b, h, w))
    conf = jnp.take_along_axis(
        heatmap.reshape(b, -1), (rc[:, 0] * w + rc[:, 1])[:, None], axis=1
    )[:, 0]
    return jnp.stack([rc[:, 1], rc[:, 0]], axis=1), conf


@jax.jit
def gate_bimanual(left_pick, right_pick, left_place, right_place, left_conf, right_conf,
                  threshold: float = 0.5):
    """Confidence gating for dual-arm actions (models/__init__.py:119-141).

    An arm acts iff its pick confidence >= threshold OR it is the
    more-confident arm (so at least one arm always acts); an inactive arm's
    pick AND place become DUMMY_PIXEL. Returns float32 pixel arrays.
    """
    conf = jnp.stack([left_conf, right_conf])  # (2, B)
    act = jnp.logical_or(conf >= threshold, jnp.argmax(conf, axis=0)[None, :]
                         == jnp.arange(2)[:, None])
    dummy = jnp.full_like(jnp.asarray(left_pick, jnp.float32), DUMMY_PIXEL)

    def apply(p, m):
        return jnp.where(m[:, None], jnp.asarray(p, jnp.float32), dummy)

    return (
        apply(left_pick, act[0]),
        apply(right_pick, act[1]),
        apply(left_place, act[0]),
        apply(right_place, act[1]),
    )


@partial(jax.jit, static_argnames=("temperature",))
def soft_argmax(heatmap, temperature: float = 1.0):
    """Differentiable expected-pixel decode: softmax-weighted coordinates.

    Not in the reference — a TPU-friendly extra that keeps decoding on-device
    and differentiable (useful for end-to-end metric surrogates). Returns
    (B, 2) ``[x, y]`` float32.
    """
    b, h, w = heatmap.shape
    p = jax.nn.softmax(heatmap.reshape(b, -1) / temperature, axis=-1).reshape(b, h, w)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    ey = jnp.einsum("bhw,h->b", p, ys)
    ex = jnp.einsum("bhw,w->b", p, xs)
    return jnp.stack([ex, ey], axis=1)

"""Depth-map transforms: masking, shift augmentation, noise, standardization.

Jittable counterparts of /root/reference/bifold/data/depth_augmentations.py.
The reference's DepthNoise wraps open3d's Redwood sensor-noise simulator; the
TPU version implements the same disparity-domain Gaussian noise model directly
(per-pixel disparity jitter + spatial wiggle) so the augmentation exists
without an open3d dependency — gated off by default, like the reference
config (conf/processor/default.yaml: add_depth_noise: false).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "mask_depth",
    "depth_shift",
    "truncated_standardization",
    "depth_noise",
    "round_mask",
]


def mask_depth(depth, mask=None):
    """Zero out background depth (reference MaskDepth, depth_augmentations.py:45-51)."""
    depth = jnp.asarray(depth)
    return depth if mask is None else depth * jnp.asarray(mask, depth.dtype)


def depth_shift(key, depth, min_shift: float = -0.2, max_shift: float = 0.2):
    """Uniform global depth shift (reference DepthScale, :34-42)."""
    shift = jax.random.uniform(key, (), minval=min_shift, maxval=max_shift)
    return jnp.asarray(depth) + shift


@partial(jax.jit, static_argnames=("thresh",))
def truncated_standardization(depth, thresh: float = 0.1):
    """Standardize by the mean/var of the central (1-2*thresh) quantile mass
    (reference TruncatedDepthStandardization, :6-18).

    The reference sorts the full map; on TPU a sort over H*W is fine under XLA
    and stays on-device.
    """
    depth = jnp.asarray(depth, jnp.float32)
    flat = jnp.sort(depth.reshape(-1))
    n = flat.shape[0]
    lo, hi = int(thresh * n), int((1 - thresh) * n)
    trunc = flat[lo:hi]
    mean = trunc.mean()
    var = trunc.var()
    return (depth - mean) / jnp.sqrt(var + 1e-6)


def depth_noise(key, depth, sigma_disparity: float = 0.005, sigma_spatial: float = 0.5):
    """Redwood-style sensor noise: jitter in disparity space + small random
    spatial offsets (simplified from the o3d.t.io.DepthNoiseSimulator model
    the reference uses, depth_augmentations.py:20-31)."""
    depth = jnp.asarray(depth, jnp.float32)
    h, w = depth.shape[-2], depth.shape[-1]
    kd, ky, kx = jax.random.split(key, 3)
    # spatial wiggle: sample depth at jittered integer coordinates
    dy = jnp.rint(jax.random.normal(ky, (h, w)) * sigma_spatial).astype(jnp.int32)
    dx = jnp.rint(jax.random.normal(kx, (h, w)) * sigma_spatial).astype(jnp.int32)
    ys = jnp.clip(jnp.arange(h)[:, None] + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w)[None, :] + dx, 0, w - 1)
    wiggled = depth[..., ys, xs]
    # disparity-domain gaussian noise (only where depth is valid)
    disparity = jnp.where(wiggled > 0, 1.0 / jnp.maximum(wiggled, 1e-6), 0.0)
    noisy_disp = disparity + jax.random.normal(kd, disparity.shape) * sigma_disparity
    noisy = jnp.where(noisy_disp > 1e-6, 1.0 / jnp.maximum(noisy_disp, 1e-6), 0.0)
    return jnp.where(wiggled > 0, noisy, wiggled)


def round_mask(mask):
    """Round a resized soft mask back to {0,1} (reference mask_augmentations.Round)."""
    return jnp.round(jnp.asarray(mask))

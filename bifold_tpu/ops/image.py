"""On-device image preprocessing: resize-as-matmul, normalize, composite.

The reference preprocesses on CPU workers with PIL/torchvision
(/root/reference/bifold/data/processor.py:48-124). Here the whole chain is
XLA: separable resampling is expressed as two small matrix multiplies
(``R @ img @ C^T``), which XLA tiles straight onto the MXU and fuses with the
surrounding normalize/composite arithmetic — the design that replaces the
reference's ``num_workers=6`` CPU pipeline.

Kernel parity: PIL (and torchvision v2 with its default ``antialias=True``)
uses the Keys cubic kernel with ``a = -0.5`` and scales the kernel support by
the downscale factor. ``resample_matrix`` reproduces that exactly, so resized
images match the reference's float output to ~1e-6 (validated in
tests/test_ops_image.py against PIL/torchvision goldens).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = [
    "resample_matrix",
    "resize",
    "normalize",
    "composite_background",
    "center_crop",
    "SIGLIP_MEAN",
    "SIGLIP_STD",
    "CLIP_MEAN",
    "CLIP_STD",
    "GRAY_BACKGROUND",
]

SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
# The reference composites cloth over gray-77 background (processor.py:256-258)
GRAY_BACKGROUND = 77.0


def _cubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic convolution kernel (PIL's BICUBIC uses a=-0.5)."""
    x = np.abs(x)
    x2, x3 = x * x, x * x * x
    w = np.where(
        x <= 1.0,
        (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0,
        np.where(x < 2.0, a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return w


def _linear_kernel(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.where(x < 1.0, 1.0 - x, 0.0)


@lru_cache(maxsize=64)
def resample_matrix(
    in_size: int,
    out_size: int,
    method: str = "bicubic",
    antialias: bool = True,
    a: float = -0.5,
) -> np.ndarray:
    """(out_size, in_size) 1-D resampling matrix with PIL semantics.

    Coordinate map: ``src = (dst + 0.5) * in/out - 0.5``. When downscaling
    with antialias, the kernel is stretched by the scale factor (PIL's
    "support" scaling). Rows are normalized to sum to 1; out-of-range taps
    clamp to the edge (PIL edge handling).
    """
    if method == "bicubic":
        kernel, support = (lambda x: _cubic_kernel(x, a)), 2.0
    elif method == "bilinear":
        kernel, support = _linear_kernel, 1.0
    elif method == "nearest":
        m = np.zeros((out_size, in_size), dtype=np.float32)
        scale = in_size / out_size
        src = np.minimum((np.arange(out_size) + 0.5) * scale, in_size - 1).astype(int)
        m[np.arange(out_size), src] = 1.0
        return m
    else:
        raise ValueError(f"Unknown resample method {method!r}")

    # PIL's exact windowing (Resample in libImaging): the tap window is
    # clipped to the image and weights renormalized within it, so border
    # pixels match PIL/torch-antialias bit-for-bit in float.
    scale = in_size / out_size
    filter_scale = max(scale, 1.0) if antialias else 1.0
    sup = support * filter_scale
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - sup + 0.5), 0)
        xmax = min(int(center + sup + 0.5), in_size)
        taps = np.arange(xmin, xmax)
        w = kernel((taps + 0.5 - center) / filter_scale)
        total = w.sum()
        if total != 0:
            w = w / total
        m[i, xmin:xmax] = w
    return m.astype(np.float32)


def resize(img, out_hw, method: str = "bicubic", antialias: bool = True):
    """Resize (..., H, W) -> (..., H', W') via two MXU matmuls.

    Channel/batch dims lead (NCHW-style trailing spatial dims), matching how
    the models consume images.
    """
    out_h, out_w = (out_hw, out_hw) if isinstance(out_hw, int) else out_hw
    in_h, in_w = img.shape[-2], img.shape[-1]
    img = jnp.asarray(img)
    dtype = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    x = img.astype(dtype)
    if in_h != out_h:
        r = jnp.asarray(resample_matrix(in_h, out_h, method, antialias), dtype)
        x = jnp.einsum("oh,...hw->...ow", r, x)
    if in_w != out_w:
        c = jnp.asarray(resample_matrix(in_w, out_w, method, antialias), dtype)
        x = jnp.einsum("ow,...hw->...ho", c, x)
    return x


def center_crop(img, size: int):
    """Center crop trailing (H, W) dims to (size, size) — torchvision semantics
    (pads are not needed in our pipelines; inputs are always >= size)."""
    h, w = img.shape[-2], img.shape[-1]
    top = (h - size) // 2
    left = (w - size) // 2
    return img[..., top : top + size, left : left + size]


def normalize(img, mean, std, scale: float = 1.0 / 255.0):
    """uint8-range image -> float normalized: (img*scale - mean) / std.

    ``img`` is (..., C, H, W); mean/std are per-channel.
    """
    img = jnp.asarray(img, jnp.float32)
    mean = jnp.asarray(mean, jnp.float32)[..., :, None, None]
    std = jnp.asarray(std, jnp.float32)[..., :, None, None]
    return (img * scale - mean) / std


def composite_background(rgb, mask, background: float = GRAY_BACKGROUND):
    """Composite (..., C, H, W) rgb over a flat background where mask==0.

    Matches the reference's masked gray-77 composite (processor.py:256-258),
    including the uint8 truncation it applies before resizing.
    """
    rgb = jnp.asarray(rgb)
    mask = jnp.asarray(mask)
    if mask.ndim == rgb.ndim - 1:
        mask = mask[..., None, :, :]
    out = rgb * mask + (1 - mask) * background
    return out.astype(jnp.uint8) if rgb.dtype == jnp.uint8 else out

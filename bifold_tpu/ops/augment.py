"""Joint spatial augmentation of images + label pixels, fully jittable.

The reference rejection-samples (rot, dx, dy) up to ``max_trials`` times in
Python, retrying whenever a transformed label pixel leaves the frame
(/root/reference/bifold/data/processor.py:302-355). Rejection sampling is
data-dependent control flow, so the TPU version draws all ``max_trials``
parameter triples up front, transforms every label set for every trial in one
vectorized computation, and selects the first in-frame trial (identity when
none succeeds) — identical semantics, no host round-trip, constant shapes.

Conventions match the reference exactly:
- pixels are ``[x, y]`` and rotate by ``-angle`` about ``(image_size-1)/2``
  then translate by ``(+dx, +dy)`` (processor.py:344-355);
- images warp like ``torchvision.transforms.v2.functional.affine(angle,
  translate=[dx, dy], scale=1, shear=0)`` with *nearest* interpolation (the
  torchvision default the reference implicitly uses), validated against
  torchvision in tests/test_ops_augment.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["aug_pixels", "affine_warp", "spatial_augment"]


def _rot2d(angle_deg):
    rad = jnp.deg2rad(angle_deg)
    c, s = jnp.cos(rad), jnp.sin(rad)
    return jnp.array([[c, -s], [s, c]])


def aug_pixels(pixels, angle_deg, dx, dy, size):
    """Transform (N, 2) ``[x, y]`` pixels: rotate by ``-angle`` about
    ``size/2`` (reference passes ``size = image_size - 1``), then translate."""
    r = _rot2d(-angle_deg)
    p = jnp.asarray(pixels, jnp.float32) - size / 2.0
    p = p @ r.T
    p = p + size / 2.0
    return p + jnp.stack([dx, dy]).astype(p.dtype)


@partial(jax.jit, static_argnames=("order",))
def affine_warp(img, angle_deg, dx, dy, order: str = "nearest"):
    """Rotate (..., H, W) image content by ``angle`` deg CCW about the center
    then translate by (dx right, dy down) — torchvision affine semantics
    (center = ((W-1)/2, (H-1)/2), zeros fill). ``order``: nearest|bilinear."""
    img = jnp.asarray(img)
    h, w = img.shape[-2], img.shape[-1]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    # Inverse map: undo translation, rotate output coords by +angle (the
    # inverse of the CCW content rotation in image coords where y points down).
    rad = jnp.deg2rad(angle_deg)
    c, s = jnp.cos(rad), jnp.sin(rad)
    xo = xs - cx - dx
    yo = ys - cy - dy
    xi = c * xo - s * yo + cx
    yi = s * xo + c * yo + cy

    flat = img.reshape(-1, h, w)

    if order == "nearest":
        xr = jnp.rint(xi).astype(jnp.int32)
        yr = jnp.rint(yi).astype(jnp.int32)
        inb = (xr >= 0) & (xr < w) & (yr >= 0) & (yr < h)
        xr = jnp.clip(xr, 0, w - 1)
        yr = jnp.clip(yr, 0, h - 1)
        out = flat[:, yr, xr]
        out = jnp.where(inb[None], out, jnp.zeros_like(out))
    elif order == "bilinear":
        x0 = jnp.floor(xi)
        y0 = jnp.floor(yi)
        wx = (xi - x0)[None]
        wy = (yi - y0)[None]
        vals = 0.0
        for oy, wgt_y in ((0, 1.0 - wy), (1, wy)):
            for ox, wgt_x in ((0, 1.0 - wx), (1, wx)):
                xg = (x0 + ox).astype(jnp.int32)
                yg = (y0 + oy).astype(jnp.int32)
                inb = (xg >= 0) & (xg < w) & (yg >= 0) & (yg < h)
                v = flat[:, jnp.clip(yg, 0, h - 1), jnp.clip(xg, 0, w - 1)]
                vals = vals + jnp.where(inb[None], v * wgt_y * wgt_x, 0.0)
        out = vals
    else:
        raise ValueError(f"Unknown interpolation order {order!r}")
    return out.reshape(img.shape).astype(img.dtype)


@partial(jax.jit, static_argnames=("image_size", "max_trials", "order"))
def spatial_augment(
    key,
    images,
    pixels,
    pixels_valid,
    *,
    image_size: int,
    max_trials: int = 5,
    rotate_range=(-5.0, 6.0),
    translate_range=(-5.0, 6.0),
    order: str = "nearest",
):
    """Jointly augment a dict of images and a (P, 2) label-pixel array.

    images: pytree of (..., H, W) arrays warped together;
    pixels: (P, 2) ``[x, y]``; pixels_valid: (P,) bool — invalid entries
    (DUMMY -1s) neither constrain trial acceptance nor get transformed.

    Returns (images, pixels, accepted: bool). The first of ``max_trials``
    i.i.d. uniform (angle, dx, dy) draws whose valid pixels all stay inside
    ``[0, image_size - 1)`` wins (reference's in-frame assert,
    processor.py:354); if none does, the identity transform is applied —
    matching the reference's silent give-up after its trials.
    """
    ka, kx, ky = jax.random.split(key, 3)
    size = image_size - 1
    angles = jax.random.uniform(ka, (max_trials,), minval=rotate_range[0], maxval=rotate_range[1])
    dxs = jax.random.uniform(kx, (max_trials,), minval=translate_range[0], maxval=translate_range[1])
    dys = jax.random.uniform(ky, (max_trials,), minval=translate_range[0], maxval=translate_range[1])

    pix = jnp.asarray(pixels, jnp.float32)
    pvalid = jnp.asarray(pixels_valid, bool)

    def trial(angle, dx, dy):
        p = aug_pixels(pix, angle, dx, dy, size)
        inframe = (p >= 0.0) & (p < size)
        ok = jnp.all(jnp.where(pvalid[:, None], inframe, True))
        return p, ok

    trial_pix, trial_ok = jax.vmap(trial)(angles, dxs, dys)  # (T, P, 2), (T,)
    accepted = jnp.any(trial_ok)
    t = jnp.argmax(trial_ok)  # first True

    angle = jnp.where(accepted, angles[t], 0.0)
    dx = jnp.where(accepted, dxs[t], 0.0)
    dy = jnp.where(accepted, dys[t], 0.0)
    out_pix = jnp.where(accepted & pvalid[:, None], trial_pix[t], pix)

    out_images = jax.tree_util.tree_map(
        lambda im: affine_warp(im, angle, dx, dy, order=order), images
    )
    return out_images, out_pix, accepted

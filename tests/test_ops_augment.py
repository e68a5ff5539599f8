"""Spatial augmentation parity vs torchvision affine + reference pixel math."""

import jax
import numpy as np
import pytest

from bifold_tpu.ops.augment import affine_warp, aug_pixels, spatial_augment


def _ref_aug_pixel(pixel, angle, dx, dy, size):
    # numpy port of processor._aug_pixel (called with -angle by the reference)
    rad = np.deg2rad(angle)
    R = np.array([[np.cos(rad), -np.sin(rad)], [np.sin(rad), np.cos(rad)]])
    p = pixel.astype(float) - size / 2
    p = p @ R.T
    p = p + size / 2
    p[:, 0] += dx
    p[:, 1] += dy
    return p


def test_aug_pixels_matches_reference():
    size = 223
    pts = np.array([[100.0, 50.0], [10.0, 200.0]])
    for angle, dx, dy in [(3.7, 2.0, -4.0), (-4.9, -1.5, 3.0)]:
        ours = np.asarray(aug_pixels(pts, angle, dx, dy, size))
        ref = _ref_aug_pixel(pts.copy(), -angle, dx, dy, size)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def _np_affine_nearest(img, angle, dx, dy):
    # independent numpy golden: content rotated by `angle` deg CCW about the
    # center ((w-1)/2, (h-1)/2) then translated by (dx, dy); inverse mapping.
    h, w = img.shape[-2:]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = np.mgrid[0:h, 0:w].astype(float)
    rad = np.deg2rad(angle)
    c, s = np.cos(rad), np.sin(rad)
    xo, yo = xs - cx - dx, ys - cy - dy
    xi = np.rint(c * xo - s * yo + cx).astype(int)
    yi = np.rint(s * xo + c * yo + cy).astype(int)
    inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    out = np.zeros_like(img)
    out[..., ys[inb].astype(int), xs[inb].astype(int)] = img[..., yi[inb], xi[inb]]
    return out


@pytest.mark.parametrize("angle,dx,dy", [(4.0, 3.0, -2.0), (-5.0, -4.0, 5.0), (0.0, 2.0, 0.0)])
def test_affine_warp_matches_numpy_golden(rng, angle, dx, dy):
    img = rng.random((1, 48, 48)).astype(np.float32)
    ref = _np_affine_nearest(img, angle, dx, dy)
    ours = np.asarray(affine_warp(img, angle, dx, dy, order="nearest"))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("angle", [3.0, -4.5])
def test_affine_warp_rotation_direction(rng, angle):
    """Content rotation direction must be the inverse of the pixel transform:
    a dot placed at p must land where aug_pixels maps p."""
    size = 63
    img = np.zeros((1, size, size), np.float32)
    img[0, 20, 45] = 1.0
    ours = np.asarray(affine_warp(img, angle, 0.0, 0.0, order="nearest"))[0]
    ny, nx = np.unravel_index(ours.argmax(), ours.shape)
    exp = np.asarray(aug_pixels(np.array([[45.0, 20.0]]), angle, 0.0, 0.0, size - 1))[0]
    assert abs(nx - exp[0]) <= 1.0 and abs(ny - exp[1]) <= 1.0


def test_affine_warp_identity():
    img = np.arange(64, dtype=np.float32).reshape(1, 8, 8)
    np.testing.assert_allclose(np.asarray(affine_warp(img, 0.0, 0.0, 0.0)), img)


def test_spatial_augment_joint_consistency(rng):
    """A bright dot at the label pixel must move with the label."""
    size = 64
    x, y = 40, 22
    img = np.zeros((1, size, size), np.float32)
    img[0, y, x] = 1.0
    pixels = np.array([[x, y]], np.float32)
    key = jax.random.PRNGKey(3)
    (out_img,), out_pix, accepted = spatial_augment(
        key, (img,), pixels, np.array([True]), image_size=size,
        rotate_range=(-5.0, 6.0), translate_range=(-5.0, 6.0),
    )
    assert bool(accepted)
    out_img = np.asarray(out_img)[0]
    oy, ox = np.unravel_index(out_img.argmax(), out_img.shape)
    px, py = np.asarray(out_pix)[0]
    assert abs(ox - px) <= 1.5 and abs(oy - py) <= 1.5
    assert 0 <= px < size - 1 and 0 <= py < size - 1


def test_spatial_augment_rejects_out_of_frame(rng):
    """Labels near the corner force rejection; identity when all trials fail."""
    size = 32
    pixels = np.array([[0.5, 0.5]], np.float32)  # any negative shift exits frame
    img = np.zeros((1, size, size), np.float32)
    key = jax.random.PRNGKey(0)
    (out_img,), out_pix, accepted = spatial_augment(
        key, (img,), pixels, np.array([True]), image_size=size,
        rotate_range=(-5.0, 6.0), translate_range=(-30.0, -20.0),
    )
    assert not bool(accepted)
    np.testing.assert_allclose(np.asarray(out_pix), pixels)  # identity


def test_spatial_augment_ignores_invalid_pixels():
    size = 32
    pixels = np.array([[-1.0, -1.0], [16.0, 16.0]], np.float32)
    valid = np.array([False, True])
    img = np.zeros((1, size, size), np.float32)
    (out_img,), out_pix, accepted = spatial_augment(
        jax.random.PRNGKey(1), (img,), pixels, valid, image_size=size
    )
    assert bool(accepted)
    np.testing.assert_allclose(np.asarray(out_pix)[0], [-1.0, -1.0])  # untouched

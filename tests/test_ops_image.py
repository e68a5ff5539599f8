"""Image pipeline parity: resize-as-matmul vs PIL/torchvision goldens."""

import numpy as np
import pytest

from bifold_tpu.ops import image as I


def test_bicubic_matches_pil_downscale(rng):
    PIL = pytest.importorskip("PIL.Image")
    src = rng.integers(0, 256, (96, 96), dtype=np.uint8).astype(np.float32)
    # 'F' mode uses PIL's float path (uint8 mode quantizes kernel weights)
    ref = np.asarray(PIL.fromarray(src, mode="F").resize((48, 48), PIL.Resampling.BICUBIC))
    ours = np.asarray(I.resize(src, 48, "bicubic", antialias=True))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_bicubic_matches_torch_antialias(rng):
    # torch interpolate(antialias=True) is the same PIL-compatible algorithm
    # torchvision v2 Resize uses for tensors.
    torch = pytest.importorskip("torch")

    src = rng.random((3, 100, 100)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(src)[None], size=(56, 56), mode="bicubic", antialias=True
    ).numpy()[0]
    ours = np.asarray(I.resize(src, 56, "bicubic", antialias=True))
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_bilinear_matches_torch_antialias(rng):
    torch = pytest.importorskip("torch")

    src = rng.random((1, 72, 72)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(src)[None], size=(24, 24), mode="bilinear", antialias=True
    ).numpy()[0]
    ours = np.asarray(I.resize(src, 24, "bilinear", antialias=True))
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_upscale_no_antialias_matches_torch_bicubic(rng):
    torch = pytest.importorskip("torch")
    src = rng.random((1, 1, 24, 24)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(src), size=(96, 96), mode="bicubic", align_corners=False
    ).numpy()[0, 0]
    # torch's GPU/CPU bicubic uses a=-0.75 without antialias
    ours = np.asarray(I.resize(src[0, 0], 96, "bicubic", antialias=False))
    # a differs (-0.5 vs -0.75); only check coarse agreement here
    assert np.abs(ours - ref).max() < 0.12


def test_resize_identity():
    src = np.arange(64, dtype=np.float32).reshape(8, 8)
    np.testing.assert_allclose(np.asarray(I.resize(src, 8)), src, atol=1e-6)


def test_center_crop():
    src = np.arange(36, dtype=np.float32).reshape(6, 6)
    out = np.asarray(I.center_crop(src, 4))
    np.testing.assert_array_equal(out, src[1:5, 1:5])


def test_normalize_roundtrip():
    img = np.full((3, 4, 4), 128, np.uint8)
    out = np.asarray(I.normalize(img, I.SIGLIP_MEAN, I.SIGLIP_STD))
    np.testing.assert_allclose(out, (128 / 255 - 0.5) / 0.5, atol=1e-6)


def test_composite_background_matches_reference_formula(rng):
    rgb = rng.integers(0, 256, (14, 14, 3), dtype=np.uint8).transpose(2, 0, 1)
    mask = (rng.random((14, 14)) > 0.5).astype(np.uint8)
    out = np.asarray(I.composite_background(rgb, mask))
    ref = (rgb * mask[None] + (1 - mask[None]) * 77).astype(np.uint8)
    np.testing.assert_array_equal(out, ref)

"""Gaussmap targets vs a reference-style numpy implementation."""

import numpy as np
import pytest

from bifold_tpu.ops.gaussmap import batched_gaussmap, gaussmap

SIZE, SIGMA = 48, 5.0


def _ref_gaussmap(points, size=SIZE, sigma=SIGMA, strategy="gmm"):
    # Independent numpy port of processor._make_gaussmap semantics
    xy = np.arange(size)
    x, y = np.meshgrid(xy, xy)
    if points is None or len(points) == 0:
        return np.zeros_like(x, dtype=np.float64)
    strategy = strategy if len(points) > 1 else "first"
    if strategy == "first":
        cx, cy = round(points[0][0]), round(points[0][1])
        return np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * sigma * sigma))
    g = np.zeros_like(x, dtype=np.float64)
    for cx, cy in np.round(np.asarray(points, float)):
        g += np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * sigma**2)) / (
            2 * np.pi * sigma**2
        )
    return g / g.max()


def test_single_point_matches_reference():
    pts = np.array([[10.0, 20.0], [-1.0, -1.0]])
    valid = np.array([True, False])
    ours = np.asarray(gaussmap(pts, valid, SIZE, SIGMA, "gmm"))
    ref = _ref_gaussmap([[10.0, 20.0]])
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # peak lands at map[y, x]
    assert ours[20, 10] == pytest.approx(1.0)


def test_multi_point_gmm_matches_reference():
    pts = np.array([[10.2, 20.7], [30.0, 12.0], [11.0, 21.0]])
    valid = np.ones(3, bool)
    ours = np.asarray(gaussmap(pts, valid, SIZE, SIGMA, "gmm"))
    ref = _ref_gaussmap(pts.tolist())
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    assert ours.max() == pytest.approx(1.0)


def test_first_strategy_uses_first_valid():
    pts = np.array([[5.0, 5.0], [30.0, 30.0]])
    ours = np.asarray(gaussmap(pts, np.array([False, True]), SIZE, SIGMA, "first"))
    assert ours[30, 30] == pytest.approx(1.0)
    assert ours[5, 5] < 1e-6


def test_all_invalid_returns_zeros():
    pts = -np.ones((4, 2))
    for strategy in ("first", "gmm", "fit"):
        m = np.asarray(gaussmap(pts, np.zeros(4, bool), SIZE, SIGMA, strategy))
        assert m.shape == (SIZE, SIZE)
        np.testing.assert_allclose(m, 0.0, atol=1e-12)


def test_fit_matches_scipy():
    scipy_stats = pytest.importorskip("scipy.stats")
    pts = np.array([[10.0, 20.0], [14.0, 23.0], [12.0, 18.0], [16.0, 25.0]])
    ours = np.asarray(gaussmap(pts, np.ones(4, bool), SIZE, SIGMA, "fit"))
    mean = pts.mean(0)
    cov = np.cov(pts, rowvar=False)
    xy = np.arange(SIZE)
    x, y = np.meshgrid(xy, xy)
    ref = scipy_stats.multivariate_normal(mean, cov).pdf(np.dstack([x, y]))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_batched_matches_loop():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, SIZE - 1, size=(6, 3, 2))
    valid = rng.random((6, 3)) > 0.3
    batched = np.asarray(batched_gaussmap(pts, valid, SIZE, SIGMA, "gmm"))
    for i in range(6):
        single = np.asarray(gaussmap(pts[i], valid[i], SIZE, SIGMA, "gmm"))
        np.testing.assert_allclose(batched[i], single, atol=1e-6)

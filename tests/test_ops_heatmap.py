"""Heatmap decode + bimanual gating vs reference-style numpy loops."""

import numpy as np

from bifold_tpu.ops.heatmap import (
    DUMMY_PIXEL,
    decode_heatmap,
    gate_bimanual,
    nearest_to_mask,
    soft_argmax,
)


def _ref_sample(heatmaps, masks=None):
    # numpy port of models/utils.sample_from_heatmap semantics
    pixels, confs = [], []
    for i, hm in enumerate(heatmaps):
        rc = np.array(np.unravel_index(hm.argmax(), hm.shape))
        if masks is not None:
            idx = np.argwhere(masks[i])
            rc = idx[((idx - rc) ** 2).sum(1).argmin()]
        pixels.append([rc[1], rc[0]])
        confs.append(hm[rc[0], rc[1]])
    return np.array(pixels), np.array(confs)


def test_decode_matches_reference_no_mask(rng):
    hm = rng.random((4, 32, 32)).astype(np.float32)
    px, conf = decode_heatmap(hm)
    ref_px, ref_conf = _ref_sample(hm)
    np.testing.assert_array_equal(np.asarray(px), ref_px)
    np.testing.assert_allclose(np.asarray(conf), ref_conf)


def test_decode_with_mask_snaps(rng):
    hm = rng.random((3, 24, 24)).astype(np.float32)
    mask = np.zeros((3, 24, 24), np.float32)
    mask[:, 4:9, 15:20] = 1  # argmax will usually be outside this box
    px, conf = decode_heatmap(hm, mask, use_mask=True)
    ref_px, ref_conf = _ref_sample(hm, mask)
    np.testing.assert_array_equal(np.asarray(px), ref_px)
    np.testing.assert_allclose(np.asarray(conf), ref_conf)
    # snapped pixels are inside the mask
    for (x, y), m in zip(np.asarray(px), mask):
        assert m[y, x] == 1


def test_nearest_to_mask_tie_break_matches_numpy():
    mask = np.zeros((1, 8, 8), np.float32)
    mask[0, 2, 2] = mask[0, 2, 4] = 1  # equidistant from (2,3)
    got = np.asarray(nearest_to_mask(np.array([[2, 3]]), mask))[0]
    idx = np.argwhere(mask[0])
    ref = idx[((idx - [2, 3]) ** 2).sum(1).argmin()]
    np.testing.assert_array_equal(got, ref)


def _ref_gate(left_pick, right_pick, left_place, right_place, lc, rc, thr):
    pick = np.stack((left_pick, right_pick)).astype(float)
    confidences = np.stack((lc, rc))
    B = confidences.shape[-1]
    mask = np.logical_or(
        confidences >= thr,
        confidences.argmax(axis=0) == np.tile(np.arange(2), (B, 1)).T,
    )
    pick[~mask] = DUMMY_PIXEL
    lp, rp = pick
    lpl = left_place.astype(float).copy()
    rpl = right_place.astype(float).copy()
    lpl[~mask[0]] = DUMMY_PIXEL
    rpl[~mask[1]] = DUMMY_PIXEL
    return lp, rp, lpl, rpl


def test_gate_bimanual_matches_reference(rng):
    B = 6
    lp, rp, lpl, rpl = [rng.integers(0, 32, (B, 2)).astype(np.float32) for _ in range(4)]
    lc = rng.random(B).astype(np.float32)
    rc = rng.random(B).astype(np.float32)
    ours = gate_bimanual(lp, rp, lpl, rpl, lc, rc, 0.5)
    ref = _ref_gate(lp, rp, lpl, rpl, lc, rc, 0.5)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o), r)


def test_gate_always_at_least_one_arm(rng):
    B = 5
    lp = np.zeros((B, 2), np.float32)
    rp = np.ones((B, 2), np.float32)
    lc = np.full(B, 0.01, np.float32)
    rc = np.full(B, 0.02, np.float32)
    out = gate_bimanual(lp, rp, lp, rp, lc, rc, 0.5)
    left_active = np.asarray(out[0])[:, 0] != DUMMY_PIXEL
    right_active = np.asarray(out[1])[:, 0] != DUMMY_PIXEL
    assert np.all(left_active | right_active)
    assert np.all(right_active)  # right is more confident everywhere


def test_soft_argmax_peaks_at_argmax():
    hm = np.zeros((1, 16, 16), np.float32)
    hm[0, 11, 3] = 50.0
    px = np.asarray(soft_argmax(hm, temperature=0.1))[0]
    np.testing.assert_allclose(px, [3.0, 11.0], atol=1e-3)


def test_nearest_to_mask_empty_mask_keeps_pixel():
    """An all-False mask row falls back to the UNSNAPPED pixel — the old
    argmin-of-constant behavior silently snapped to (0, 0), turning a
    perception failure into a corner action; the reference's argwhere code
    would crash instead. Mixed batches snap only the rows with mask."""
    hm = np.zeros((2, 8, 8), np.float32)
    hm[0, 5, 6] = 1.0
    hm[1, 3, 2] = 1.0
    mask = np.zeros((2, 8, 8), np.float32)
    mask[1, 7, 7] = 1.0  # sample 1 snaps; sample 0 has no mask at all
    px, conf = decode_heatmap(hm, mask, use_mask=True)
    np.testing.assert_array_equal(np.asarray(px[0]), [6, 5])  # [x, y] kept
    np.testing.assert_array_equal(np.asarray(px[1]), [7, 7])  # snapped
    assert float(conf[0]) == 1.0  # confidence read at the kept argmax

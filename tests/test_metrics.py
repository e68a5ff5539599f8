"""Metric semantics (counterpart behaviors of reference
bifold/metrics/__init__.py on synthetic decoded actions)."""

import numpy as np

from bifold_tpu.env.action import Action
from bifold_tpu.metrics import Metrics


def _pad(points, k=8):
    out = -np.ones((len(points), k, 2), np.float32)
    for i, p in enumerate(points):
        p = np.asarray(p, np.float32).reshape(-1, 2)
        out[i, : len(p)] = p
    return out


def test_kp_mse_exact_and_offset():
    sample = {"pick": _pad([[[10, 10]], [[20, 20]]]),
              "place": _pad([[[30, 30]], [[40, 40]]])}
    action = Action(pick=np.array([[10.0, 10.0], [23.0, 24.0]]),
                    place=np.array([[30.0, 30.0], [40.0, 40.0]]))
    m = Metrics({"computed_metrics": ["kp_mse"], "tracked_metric": "kp_mse"})
    m(action=action, sample=sample)
    _, vals = m.summary()
    # pick distances: 0 and 5; place: 0, 0 -> (2.5 + 0) / 4
    assert abs(vals["kp_mse"] - (2.5 + 0.0) / 4) < 1e-6


def test_kp_mse_multikeypoint_min():
    sample = {"pick": _pad([[[10, 10], [50, 50]]]),
              "place": _pad([[[0.5, 0.5]]])}
    action = Action(pick=np.array([[50.0, 50.0]]), place=np.array([[1.0, 1.0]]))
    m = Metrics({"computed_metrics": ["kp_mse"], "tracked_metric": "kp_mse"})
    m(action=action, sample=sample)
    _, vals = m.summary()
    # pick snaps to nearest keypoint (dist 0); place dist = |(1,1)-(0,0)| (rounded)
    assert abs(vals["kp_mse"] - (0.0 + np.sqrt(2)) / 2) < 1e-6


def test_ap_threshold_and_invalid_credit():
    sample = {"pick": _pad([[[10, 10]], []]),  # second sample has no GT
              "place": _pad([[[10, 10]], [[10, 10]]])}
    action = Action(pick=np.array([[12.0, 10.0], [-1.0, -1.0]]),
                    place=np.array([[10.0, 10.0], [90.0, 90.0]]))
    m = Metrics({"computed_metrics": ["ap_5", "ap_1"], "tracked_metric": "ap_5"})
    m(action=action, sample=sample)
    _, vals = m.summary()
    # ap_5: pick hits d=2<5 plus invalid-credit; place one hit, one miss -> 3/4
    assert abs(vals["ap_5"] - 75.0) < 1e-6
    # ap_1: pick d=2 misses, invalid-credit still counts; place 1 hit -> 2/4
    assert abs(vals["ap_1"] - 50.0) < 1e-6


def test_quantile_prob_peak():
    s = 16
    hm = np.zeros((1, s, s), np.float32)
    hm[0, 5, 7] = 1.0  # peak at x=7, y=5
    sample = {"pick": _pad([[[7, 5]]]), "place": _pad([[[7, 5]]])}
    action = Action(pick=np.array([[7.0, 5.0]]), place=np.array([[7.0, 5.0]]))
    m = Metrics({"computed_metrics": ["quantile_prob"], "tracked_metric": "quantile_prob"})
    m(action=action, sample=sample,
      raw_output={"pick_heatmap": hm, "place_heatmap": hm})
    _, vals = m.summary()
    assert vals["quantile_prob"] == 100.0  # GT pixel holds the max -> rank 1


def test_iou_and_nan_when_absent():
    m = Metrics({"computed_metrics": ["iou"], "tracked_metric": "iou"})
    mask = np.zeros((1, 1, 8, 8), np.float32)
    mask[0, 0, :4] = 1
    pred = np.zeros((1, 8, 8), np.float32)
    pred[0, :2] = 1.0
    m(action=None, sample={"mask": mask}, raw_output={"mask_heatmap": pred})
    _, vals = m.summary()
    assert abs(vals["iou"] - 50.0) < 1e-6

    m2 = Metrics({"computed_metrics": ["iou"], "tracked_metric": "iou"})
    m2(action=None, sample={"mask": mask}, raw_output={})
    _, vals2 = m2.summary()
    assert np.isnan(vals2["iou"])


def test_tracked_metric_improvement_direction():
    m = Metrics({"computed_metrics": ["kp_mse"], "tracked_metric": "kp_mse"})
    sample = {"pick": _pad([[[10, 10]]]), "place": _pad([[[10, 10]]])}
    far = Action(pick=np.array([[20.0, 10.0]]), place=np.array([[10.0, 10.0]]))
    near = Action(pick=np.array([[11.0, 10.0]]), place=np.array([[10.0, 10.0]]))
    m(action=far, sample=sample)
    improved, _ = m.summary()
    assert improved
    m.reset()
    m(action=near, sample=sample)
    improved, _ = m.summary()
    assert improved  # lower kp_mse is better
    m.reset()
    m(action=far, sample=sample)
    improved, _ = m.summary()
    assert not improved


def test_border_zero_keypoint_invalidates_sample():
    """Reference validity is STRICTLY > 0 (metrics/__init__.py:113,119): a
    GT keypoint on pixel row/column 0 invalidates the sample — it is
    excluded from kp_mse and AP credits it only when the prediction is
    predicted-invalid (negative pixel)."""
    sample = {"pick": _pad([[[0, 50]], [[20, 20]]]),
              "place": _pad([[[30, 30]], [[40, 40]]])}
    action = Action(pick=np.array([[0.0, 50.0], [20.0, 20.0]]),
                    place=np.array([[30.0, 30.0], [40.0, 40.0]]))
    m = Metrics({"computed_metrics": ["kp_mse", "ap_5"],
                 "tracked_metric": "kp_mse"})
    m(action=action, sample=sample)
    _, vals = m.summary()
    # sample 0's pick (coordinate 0) is invalid: only 3 valid entries, all
    # exact -> kp_mse 0; AP credits the 3 hits but NOT the invalid sample
    # (prediction is non-negative, not "predicted invalid")
    assert abs(vals["kp_mse"]) < 1e-6
    assert abs(vals["ap_5"] - 75.0) < 1e-6


def test_iou_empty_union_scores_zero():
    """torchmetrics BinaryJaccardIndex returns 0 for 0/0 (tp+fp+fn == 0),
    not 1 — an all-background prediction on an empty GT mask is not a
    perfect score."""
    sample = {"pick": _pad([[[10, 10]]]),
              "mask": np.zeros((1, 1, 8, 8), np.float32)}
    raw = {"mask_heatmap": np.zeros((1, 8, 8), np.float32)}
    m = Metrics({"computed_metrics": ["iou"], "tracked_metric": "iou"})
    m(action=Action(pick=np.array([[10.0, 10.0]]),
                    place=np.array([[12.0, 12.0]])),
      sample=sample, raw_output=raw)
    _, vals = m.summary()
    assert vals["iou"] == 0.0

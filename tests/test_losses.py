"""Losses vs torch goldens (the reference computes nn.BCELoss on sigmoid
outputs; see /root/reference/bifold/losses/__init__.py)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from bifold_tpu.losses import binary_cross_entropy, build_loss


def _rand_sample(rng, bimanual, b=2, s=32):
    keys = (["left_pick", "right_pick", "left_place", "right_place"]
            if bimanual else ["pick", "place"])
    sample = {"mask": rng.integers(0, 2, (b, 1, s, s)).astype(np.float32)}
    output = {}
    for k in keys:
        sample[f"{k}_heatmap"] = rng.random((b, s, s), dtype=np.float32)
        output[f"{k}_heatmap"] = rng.random((b, s, s), dtype=np.float32)
    output["mask_heatmap"] = rng.random((b, s, s), dtype=np.float32).clip(1e-4, 1 - 1e-4)
    return output, sample


def test_bce_matches_torch(rng):
    p = rng.random((4, 16, 16), dtype=np.float32).clip(1e-6, 1 - 1e-6)
    t = rng.integers(0, 2, (4, 16, 16)).astype(np.float32)
    ours = float(binary_cross_entropy(jnp.asarray(p), jnp.asarray(t)))
    theirs = float(F.binary_cross_entropy(torch.tensor(p), torch.tensor(t)))
    assert abs(ours - theirs) < 1e-5


def test_bce_saturation_clamp():
    # torch clamps log(0) at -100; so do we
    p = jnp.array([[0.0, 1.0]])
    t = jnp.array([[1.0, 0.0]])
    ours = float(binary_cross_entropy(p, t))
    theirs = float(F.binary_cross_entropy(torch.tensor([[0.0, 1.0]]),
                                          torch.tensor([[1.0, 0.0]])))
    assert abs(ours - theirs) < 1e-5
    assert abs(ours - 100.0) < 1e-5


@pytest.mark.parametrize("bimanual", [False, True])
@pytest.mark.parametrize("mask_pick", [False, True])
def test_bce_gaussmap_golden(rng, bimanual, mask_pick):
    output, sample = _rand_sample(rng, bimanual)
    loss_fn = build_loss({"name": "bce_gaussmap", "is_bimanual": bimanual,
                          "mask_pick_heatmap": mask_pick})
    ours, inter = loss_fn(output, sample)

    ref = 0.0
    keys = (["left_pick", "right_pick", "left_place", "right_place"]
            if bimanual else ["pick", "place"])
    for k in keys:
        tgt = torch.tensor(sample[f"{k}_heatmap"])
        if k.endswith("pick") and mask_pick:
            tgt = tgt * torch.tensor(sample["mask"]).squeeze(1)
        ref += F.binary_cross_entropy(torch.tensor(output[f"{k}_heatmap"]), tgt)
    assert abs(float(ours) - float(ref)) < 1e-4
    assert set(inter) == set(keys)


def test_dice_focal_bce_mask_golden(rng):
    output, sample = _rand_sample(rng, False)
    mask_t = torch.tensor(sample["mask"]).squeeze(1)
    prob_t = torch.tensor(output["mask_heatmap"])

    ours, _ = build_loss({"name": "bce_mask"})(output, sample)
    assert abs(float(ours) - float(F.binary_cross_entropy(prob_t, mask_t))) < 1e-4

    ours, _ = build_loss({"name": "dice"})(output, sample)
    inputs = prob_t.flatten(1)
    targets = mask_t.flatten(1)
    num = 2 * (inputs * targets).sum(1)
    den = inputs.sum(-1) + targets.sum(-1)
    ref = (1 - (num + 1) / (den + 1)).sum()
    assert abs(float(ours) - float(ref)) < 1e-4

    ours, _ = build_loss({"name": "focal"})(output, sample)
    ce = F.binary_cross_entropy(prob_t, mask_t, reduction="none")
    p_t = prob_t * mask_t + (1 - prob_t) * (1 - mask_t)
    loss = ce * (1 - p_t) ** 2
    alpha_t = 0.25 * mask_t + 0.75 * (1 - mask_t)
    ref = (alpha_t * loss).mean(1).sum()
    assert abs(float(ours) - float(ref)) / max(abs(float(ref)), 1) < 1e-4


def test_composed_weights(rng):
    output, sample = _rand_sample(rng, False)
    composed = build_loss({"name": "composed", "loss_names": ["bce_gaussmap", "bce_mask"],
                           "weights": [2, 1], "is_bimanual": False,
                           "mask_pick_heatmap": True})
    total, inter = composed(output, sample)
    part_g, _ = build_loss({"name": "bce_gaussmap", "is_bimanual": False,
                            "mask_pick_heatmap": True})(output, sample)
    part_m, _ = build_loss({"name": "bce_mask"})(output, sample)
    assert abs(float(total) - (2 * float(part_g) + float(part_m))) < 1e-4
    assert "bce_gaussmap pick" in inter


def test_bce_saturation_gradient_finite():
    """Gradients must stay finite when sigmoid outputs saturate to exactly
    0/1 (the naive clamped-log formulation yields inf*0 = NaN and one
    saturated pixel NaNs the whole update through global-norm clipping)."""
    import jax

    def loss_of_logit(x, t):
        p = jax.nn.sigmoid(x)
        return binary_cross_entropy(p, t)

    for logit, target in [(40.0, 0.0), (-40.0, 1.0), (120.0, 0.0),
                          (0.0, 1.0), (-120.0, 1.0)]:
        val, grad = jax.value_and_grad(loss_of_logit)(
            jnp.float32(logit), jnp.float32(target))
        assert np.isfinite(float(val)), (logit, target, float(val))
        assert np.isfinite(float(grad)), (logit, target, float(grad))
    # torch value parity holds at exact saturation (clamp at 100)
    v = float(binary_cross_entropy(jnp.zeros((1,)), jnp.ones((1,))))
    assert abs(v - 100.0) < 1e-5


def test_logits_bce_matches_probability_bce_unsaturated():
    import jax
    rng = np.random.default_rng(3)
    x = rng.uniform(-8, 8, (4, 16)).astype(np.float32)
    t = rng.random((4, 16)).astype(np.float32)
    from bifold_tpu.losses import binary_cross_entropy_with_logits
    a = float(binary_cross_entropy_with_logits(jnp.asarray(x), jnp.asarray(t)))
    b = float(binary_cross_entropy(jax.nn.sigmoid(jnp.asarray(x)), jnp.asarray(t)))
    assert abs(a - b) < 1e-5


def test_logits_bce_escapes_saturation():
    """Gradient stays sigmoid(x) - t even at deep saturation — training can
    recover where the probability path's gradient is exactly zero."""
    import jax
    from bifold_tpu.losses import binary_cross_entropy_with_logits

    grad = jax.grad(lambda x: binary_cross_entropy_with_logits(
        x, jnp.float32(1.0)))(jnp.float32(-50.0))
    assert abs(float(grad) - (-1.0)) < 1e-5  # sigmoid(-50) - 1
    grad0 = jax.grad(lambda x: binary_cross_entropy(
        jax.nn.sigmoid(x), jnp.float32(1.0)))(jnp.float32(-50.0))
    assert float(grad0) == 0.0  # the pathology the logits path fixes


def test_bce_gaussmap_prefers_logits():
    loss_fn = build_loss({"name": "bce_gaussmap", "is_bimanual": False,
                          "mask_pick_heatmap": False})
    rng = np.random.default_rng(0)
    x = rng.uniform(-30, 30, (2, 8, 8)).astype(np.float32)
    import jax
    p = np.asarray(jax.nn.sigmoid(jnp.asarray(x)))
    t = rng.random((2, 8, 8)).astype(np.float32)
    sample = {"pick_heatmap": t, "place_heatmap": t}
    with_logits, _ = loss_fn({"pick_heatmap": p, "place_heatmap": p,
                              "pick_logits": x, "place_logits": x}, sample)
    probs_only, _ = loss_fn({"pick_heatmap": p, "place_heatmap": p}, sample)
    assert np.isfinite(float(with_logits))
    # at |x| up to 30 the probability path hits its clamp; logits path doesn't
    assert float(with_logits) <= float(probs_only) + 1e-4

"""Secondary head/fusion variants: MAE-style trans decoder, cross-attention
fusion, and the mask head + composed loss path (reference components
pick_place_transdecoder / crossattention / mask_head,
models/pickplace.py:66-99,127-263, fusion.py:67-125)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bifold_tpu.losses import build_loss
from bifold_tpu.models import build_model


def _sample(rng, b=2, s=32, text=8):
    return {
        "rgb": jnp.asarray(rng.standard_normal((b, 3, s, s)), jnp.float32),
        "instruction": jnp.asarray(rng.integers(0, 90, (b, text)), jnp.int32),
        "mask": jnp.asarray((rng.random((b, 1, s, s)) > 0.5), jnp.float32),
    }


def _tiny(**overrides):
    cfg = {"name": "siglip", "image_size": 32, "is_bimanual": False,
           "patch_size": 16, "automodel_name": "tiny", "dim": 32,
           "lora": False, "depth": 1, "heads": 2, "threshold": 0.01}
    cfg.update(overrides)
    return build_model(cfg)


def test_transdecoder_heads():
    rng = np.random.default_rng(0)
    model = _tiny(pick_place_model="pick_place_transdecoder")
    sample = _sample(rng)
    variables = model.init(jax.random.key(0), sample, deterministic=True)
    out = model.apply(variables, sample, deterministic=True)
    assert out["pick_heatmap"].shape == (2, 32, 32)
    assert out["place_heatmap"].shape == (2, 32, 32)
    assert float(out["pick_heatmap"].min()) >= 0
    assert float(out["pick_heatmap"].max()) <= 1


def test_transdecoder_bimanual_two_channel():
    rng = np.random.default_rng(0)
    model = _tiny(pick_place_model="pick_place_transdecoder", is_bimanual=True)
    sample = _sample(rng)
    variables = model.init(jax.random.key(0), sample, deterministic=True)
    out = model.apply(variables, sample, deterministic=True)
    for k in ("left_pick_heatmap", "right_pick_heatmap",
              "left_place_heatmap", "right_place_heatmap"):
        assert out[k].shape == (2, 32, 32)


def test_crossattention_fusion():
    rng = np.random.default_rng(0)
    model = _tiny(fusion_model="crossattention")
    sample = _sample(rng)
    variables = model.init(jax.random.key(0), sample, deterministic=True)
    out = model.apply(variables, sample, deterministic=True)
    assert out["pick_heatmap"].shape == (2, 32, 32)


@pytest.mark.parametrize("detach", [False, True])
def test_mask_head_and_composed_loss(detach):
    """compute_mask gates pick heatmaps multiplicatively and feeds the
    composed bce+mask/dice/focal losses (reference pickplace.py:66-99)."""
    rng = np.random.default_rng(0)
    model = build_model({
        "name": "siglip", "image_size": 32, "is_bimanual": False,
        "patch_size": 16, "automodel_name": "tiny", "dim": 32, "lora": False,
        "depth": 1, "heads": 2})
    # rebuild head with mask enabled via the underlying module API
    from bifold_tpu.models.pickplace import PickPlaceConvDecoder

    head = PickPlaceConvDecoder(
        dim=32, is_bimanual=False, fusion_model="concat_transformer",
        num_patches=4, patch_size=16, compute_mask=True, detach_mask=detach,
        fusion_kwargs={"heads": 2, "depth": 1})
    text = jnp.asarray(rng.standard_normal((2, 8, 32)), jnp.float32)
    image = jnp.asarray(rng.standard_normal((2, 5, 32)), jnp.float32)
    variables = head.init(jax.random.key(0), text, image)
    out = head.apply(variables, text, image)
    assert out["mask_heatmap"].shape == (2, 32, 32)
    # pick is gated by the mask head's output
    assert float(np.abs(np.asarray(out["pick_heatmap"])
                        - np.asarray(out["place_heatmap"])).max()) > 0

    sample = {"mask": jnp.asarray((rng.random((2, 1, 32, 32)) > 0.5), jnp.float32),
              "pick_heatmap": jnp.asarray(rng.random((2, 32, 32)), jnp.float32),
              "place_heatmap": jnp.asarray(rng.random((2, 32, 32)), jnp.float32)}
    loss_fn = build_loss({"name": "composed",
                          "loss_names": ["bce_gaussmap", "focal", "dice"],
                          "weights": [40, 20, 1], "is_bimanual": False,
                          "mask_pick_heatmap": True})
    total, inter = loss_fn(out, sample)
    assert np.isfinite(float(total))
    assert "focal" in inter and "dice" in inter


def test_upsample2x_matches_torch():
    """ConvDecoder's x2 bilinear matches torch Upsample(align_corners=False)
    (the reference decoder's upsampling, modules.py:69)."""
    import torch
    from bifold_tpu.models.decoders import upsample2x

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 7, 9, 3)).astype(np.float32)
    ours = np.asarray(upsample2x(jnp.asarray(x)))
    theirs = torch.nn.functional.interpolate(
        torch.tensor(x).permute(0, 3, 1, 2), scale_factor=2, mode="bilinear",
        align_corners=False).permute(0, 2, 3, 1).numpy()
    assert np.abs(ours - theirs).max() < 1e-5


def test_convdecoder_collapsed_matches_interleaved(monkeypatch):
    """The collapsed evaluation order (all Dense at the patch grid, then one
    composed x16 bilinear) is the same linear function as the reference's
    interleaved pyramid — forward AND parameter gradients (decoders.py
    module docstring; reference modules.py:33-75)."""
    from bifold_tpu.models.decoders import ConvDecoder

    rng = np.random.default_rng(0)
    # non-square grid + output_dim>1 to exercise the general case
    x = jnp.asarray(rng.standard_normal((2, 3, 5, 16)), jnp.float32)
    dec = ConvDecoder(input_dim=16, output_dim=2)
    variables = dec.init(jax.random.key(0), x)

    def run():
        def loss(v):
            out = dec.apply(v, x)
            return jnp.sum(out * out), out

        (l, out), grads = jax.value_and_grad(loss, has_aux=True)(variables)
        return np.asarray(out), jax.tree.map(np.asarray, grads)

    monkeypatch.setenv("BIFOLD_CONVDEC", "interleaved")
    out_ref, g_ref = run()
    monkeypatch.delenv("BIFOLD_CONVDEC")
    out_col, g_col = run()

    assert out_col.shape == (2, 48, 80, 2)
    scale = np.abs(out_ref).max()
    assert np.abs(out_col - out_ref).max() < 1e-5 * max(scale, 1.0)
    flat_ref = jax.tree.leaves(g_ref)
    flat_col = jax.tree.leaves(g_col)
    assert len(flat_ref) == len(flat_col) == 10  # 5 kernels + 5 biases
    for a, b in zip(flat_ref, flat_col):
        assert np.abs(a - b).max() < 1e-3 * max(np.abs(a).max(), 1.0)


def test_decode_action_graph_mode():
    """Graph-mode pick decode: node-probability heatmaps index into the
    projected node pixels (reference models/__init__.py:84-106)."""
    from bifold_tpu.models import decode_action

    rng = np.random.default_rng(0)
    b, n = 2, 10
    probs = rng.random((b, n)).astype(np.float32)
    pc = rng.uniform(0, 64, (b, n, 2)).astype(np.float32)
    place = np.zeros((b, 16, 16), np.float32)
    place[:, 5, 7] = 1.0
    out = {"pick_heatmap": jnp.asarray(probs),
           "place_heatmap": jnp.asarray(place)}
    sample = {"pixel_sampled_pc": jnp.asarray(pc)}
    decoded = decode_action(out, sample, is_bimanual=False,
                            constrain_pick_mask=False)
    for i in range(b):
        np.testing.assert_allclose(np.asarray(decoded["pick"])[i],
                                   pc[i, probs[i].argmax()], atol=1e-5)
    np.testing.assert_allclose(np.asarray(decoded["place"])[0], [7, 5])

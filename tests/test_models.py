"""Model stack: init/forward shapes, masking, LoRA, action decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bifold_tpu.models import build_model, decode_action, get_action, trainable_mask

# Small-tower configs so CPU compiles stay fast: 2-layer towers, 2-layer fusion.
_TINY = dict(
    image_size=64, patch_size=16, dim=64, depth=2, heads=4, mlp_ratio=2,
    lora=True, r=4, lora_alpha=8, lora_dropout=0.0,
    automodel_name="tiny",  # unknown name -> default tower cfg, overridden below
)


def _tiny_siglip(name="siglip", is_bimanual=False, **kw):
    import bifold_tpu.models.backbones.siglip_backbone as SB

    cfg = {"name": name, "is_bimanual": is_bimanual, **_TINY, **kw}
    model = build_model(cfg)
    # shrink the towers via a patched base config
    object.__setattr__  # noqa: B018
    return model


def _sample(b=2, img=64, txt=16, ctx=None, vocab=32000):
    rng = np.random.default_rng(0)
    s = {
        "rgb": rng.normal(size=(b, 3, img, img)).astype(np.float32),
        "instruction": rng.integers(0, vocab, (b, txt)).astype(np.int32),
        "mask": (rng.random((b, 1, img, img)) > 0.5).astype(np.float32),
    }
    if ctx is not None:
        s["rgb_context"] = rng.normal(size=(b, ctx, 3, img, img)).astype(np.float32)
        s["context_attention_mask"] = np.array([[1] * ctx, [1] + [0] * (ctx - 1)], np.int64)[:b]
    return s


@pytest.fixture(scope="module")
def tiny_tower_cfg(request):
    """Patch SIGLIP base config lookup to a 2-layer tower for all tests here."""
    import bifold_tpu.models.backbones.siglip_backbone as SB

    tiny = SB.SiglipConfig(image_size=64, patch_size=16, hidden_size=64, layers=2,
                           heads=4, mlp_dim=128, vocab_size=1000, max_text_len=16)
    orig = dict(SB.SIGLIP_BASE_CONFIGS)
    SB.SIGLIP_BASE_CONFIGS["tiny"] = tiny
    yield tiny
    SB.SIGLIP_BASE_CONFIGS.clear()
    SB.SIGLIP_BASE_CONFIGS.update(orig)


def test_siglip_forward_shapes(tiny_tower_cfg):
    model = build_model({"name": "siglip", "is_bimanual": False, **_TINY})
    sample = _sample(vocab=1000)
    variables = model.init(jax.random.PRNGKey(0), sample)
    out = jax.jit(lambda v, s: model.apply(v, s))(variables, sample)
    assert set(out) >= {"pick_heatmap", "place_heatmap"}
    assert out["pick_heatmap"].shape == (2, 64, 64)
    assert out["pick_heatmap"].dtype == jnp.float32
    v = np.asarray(out["pick_heatmap"])
    assert (v >= 0).all() and (v <= 1).all()  # sigmoid range


def test_siglip_bimanual_heads(tiny_tower_cfg):
    model = build_model({"name": "siglip", "is_bimanual": True, **_TINY})
    sample = _sample(vocab=1000)
    variables = model.init(jax.random.PRNGKey(0), sample)
    out = model.apply(variables, sample)
    assert set(out) >= {
        "left_pick_heatmap", "right_pick_heatmap",
        "left_place_heatmap", "right_place_heatmap",
    }


def test_siglip_sequential_context_and_masking(tiny_tower_cfg):
    model = build_model({
        "name": "siglip_sequential", "is_bimanual": True, "context_length": 2, **_TINY,
    })
    sample = _sample(ctx=2, vocab=1000)
    variables = model.init(jax.random.PRNGKey(0), sample)
    out = model.apply(variables, sample)
    assert out["left_pick_heatmap"].shape == (2, 64, 64)

    # padded context must not change the output when key-masked (correct mode):
    # mutate the padded frame of sample 2 wildly; logits to it are masked.
    sample2 = dict(sample)
    ctx = sample["rgb_context"].copy()
    ctx[1, 1] = 1e3
    sample2["rgb_context"] = ctx
    out2 = model.apply(variables, sample2)
    np.testing.assert_allclose(
        np.asarray(out["left_pick_heatmap"][1]),
        np.asarray(out2["left_pick_heatmap"][1]),
        atol=1e-5,
    )


def test_lora_params_exist_and_start_as_noop(tiny_tower_cfg):
    model = build_model({"name": "siglip", "is_bimanual": False, **_TINY})
    sample = _sample(vocab=1000)
    v_lora = model.init(jax.random.PRNGKey(0), sample)
    leaves = jax.tree_util.tree_leaves_with_path(v_lora["params"])
    lora_names = [p for p, _ in leaves if any(
        getattr(k, "key", None) in ("lora_a", "lora_b") for k in p)]
    assert lora_names, "expected LoRA params on q/v projections"
    # lora_b starts at zero -> adapter is a no-op at init
    for path, leaf in leaves:
        if any(getattr(k, "key", None) == "lora_b" for k in path):
            np.testing.assert_allclose(np.asarray(leaf), 0.0)


def test_trainable_mask_freezes_backbone_not_lora(tiny_tower_cfg):
    model = build_model({"name": "siglip", "is_bimanual": False, **_TINY})
    sample = _sample(vocab=1000)
    variables = model.init(jax.random.PRNGKey(0), sample)
    mask = trainable_mask(variables["params"], lora=True)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    stats = {"backbone_frozen": 0, "backbone_lora_trainable": 0, "head_trainable": 0}
    for path, trainable in flat:
        keys = [getattr(k, "key", None) for k in path]
        if "siglip_model" in keys:
            if any(k in ("lora_a", "lora_b") for k in keys):
                assert trainable
                stats["backbone_lora_trainable"] += 1
            else:
                assert not trainable
                stats["backbone_frozen"] += 1
        else:
            assert trainable
            stats["head_trainable"] += 1
    assert all(v > 0 for v in stats.values()), stats


def test_get_action_unimanual(tiny_tower_cfg):
    model = build_model({"name": "siglip", "is_bimanual": False, **_TINY})
    sample = _sample(vocab=1000)
    variables = model.init(jax.random.PRNGKey(0), sample)
    action, raw = get_action(model, variables, sample, return_raw_output=True)
    assert action.pick.shape == (2, 2)
    assert not action.is_bimanual
    # pick snapped into the mask
    for (x, y), m in zip(action.pick.astype(int), np.asarray(sample["mask"])[:, 0]):
        assert m[y, x] == 1


def test_get_action_bimanual_gating(tiny_tower_cfg):
    model = build_model({"name": "siglip", "is_bimanual": True, **_TINY})
    sample = _sample(vocab=1000)
    variables = model.init(jax.random.PRNGKey(0), sample)
    action = get_action(model, variables, sample, threshold=0.99)
    # with an extreme threshold, exactly the more confident arm acts per sample
    active = (action.left_pick[:, 0] >= 0).astype(int) + (action.right_pick[:, 0] >= 0).astype(int)
    assert (active >= 1).all()


def test_rgb_clip_forward():
    from bifold_tpu.models.backbones import clip_backbone as CB

    tiny = CB.ClipConfig(image_size=64, patch_size=16, vision_width=64,
                         vision_layers=2, vision_heads=4, text_width=32,
                         text_layers=2, text_heads=4, context_length=16,
                         vocab_size=1000, embed_dim=32)
    orig = dict(CB.CLIP_CONFIGS)
    CB.CLIP_CONFIGS["tiny"] = tiny
    try:
        model = build_model({
            "name": "rgb_clip", "image_size": 64, "is_bimanual": False,
            "patch_size": 16, "text_encoder": "tiny", "depth": 2, "heads": 4,
            "mlp_ratio": 2,
        })
        sample = _sample(txt=16, vocab=1000)
        variables = model.init(jax.random.PRNGKey(0), sample)
        out = model.apply(variables, sample)
        assert out["pick_heatmap"].shape == (2, 64, 64)
    finally:
        CB.CLIP_CONFIGS.clear()
        CB.CLIP_CONFIGS.update(orig)


def test_text_unet_forward():
    from bifold_tpu.models.backbones import clip_backbone as CB

    tiny = CB.ClipConfig(image_size=64, patch_size=16, vision_width=64,
                         vision_layers=2, vision_heads=4, text_width=32,
                         text_layers=2, text_heads=4, context_length=16,
                         vocab_size=1000, embed_dim=32)
    CB.CLIP_CONFIGS["tiny_unet"] = tiny
    try:
        model = build_model({
            "name": "text_unet", "image_size": 64, "is_bimanual": False,
            "text_encoder": "tiny_unet", "features": [8, 16, 32],
        })
        sample = _sample(txt=16, vocab=1000)
        sample["depth"] = np.random.default_rng(1).random((2, 1, 64, 64)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), sample)
        out, updates = model.apply(
            variables, sample, deterministic=False, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        assert out["pick_heatmap"].shape == (2, 64, 64)
        assert "batch_stats" in updates
    finally:
        CB.CLIP_CONFIGS.pop("tiny_unet")


def test_unknown_config_key_rejected(tiny_tower_cfg):
    with pytest.raises(TypeError):
        build_model({"name": "siglip", "is_bimanual": False, "bogus_key": 1, **_TINY})

"""precast_frozen: storing the LoRA-frozen towers in compute dtype (bf16)
is VALUE-IDENTICAL training — flax casts params to the compute dtype at use,
so the same f32->bf16 rounding happens either way; precasting just does it
once instead of every step (the train-side twin of serving's cast_params,
test_trainer.py::test_serving_precast_identical). Asserted bitwise over
multiple optimizer steps, not approximately.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bifold_tpu import parallel
from bifold_tpu.losses import build_loss
from bifold_tpu.models import build_model, precast_frozen, trainable_mask
from bifold_tpu.optim import build_optimizer

IMG, CTX, B = 32, 2, 2


def _batch(rng, b=B, s=IMG):
    batch = {
        "rgb": rng.standard_normal((b, 3, s, s)).astype(np.float32),
        "depth": rng.random((b, 1, s, s)).astype(np.float32),
        "mask": (rng.random((b, 1, s, s)) > 0.5).astype(np.float32),
        "instruction": rng.integers(0, 30000, (b, 16)).astype(np.int32),
        "rgb_context": rng.standard_normal((b, CTX, 3, s, s)).astype(np.float32),
        "context_attention_mask": rng.integers(0, 2, (b, CTX)).astype(np.int32),
    }
    for h in ("left_pick", "right_pick", "left_place", "right_place"):
        batch[f"{h}_heatmap"] = rng.random((b, s, s)).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def _build():
    model = build_model({
        "name": "siglip_sequential", "image_size": IMG, "is_bimanual": True,
        "patch_size": 16, "automodel_name": "tiny", "dim": 64, "lora": True,
        "r": 4, "depth": 2, "heads": 4, "context_length": CTX,
        "dropout": 0.0, "lora_dropout": 0.0,
    }, dtype=jnp.bfloat16)
    loss_fn = build_loss({"name": "bce_gaussmap", "is_bimanual": True,
                          "mask_pick_heatmap": False})
    return model, loss_fn


def test_precast_frozen_train_bitwise():
    rng = np.random.default_rng(0)
    model, loss_fn = _build()
    batch = _batch(rng)
    params = jax.jit(lambda: model.init(
        jax.random.key(0), batch, deterministic=True))()["params"]
    mask = trainable_mask(params, lora=True)
    # the tiny tower's embedding tables clear the shipped 2**16 threshold;
    # lower it a bit so the attention/MLP kernels participate too
    cast = precast_frozen(params, mask, jnp.bfloat16, min_size=1024)

    flat_p = jax.tree_util.tree_leaves(params)
    flat_c = jax.tree_util.tree_leaves(cast)
    flat_m = jax.tree_util.tree_leaves(mask)
    changed = [(a, b) for a, b, t in zip(flat_p, flat_c, flat_m)
               if a.dtype != b.dtype]
    assert changed, "no frozen leaf was cast — the lever is a no-op"
    assert all(b.dtype == jnp.bfloat16 and a.dtype == jnp.float32
               for a, b in changed)
    # trainable leaves keep their f32 masters untouched
    for a, b, t in zip(flat_p, flat_c, flat_m):
        if t:
            assert b.dtype == a.dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    tx, _ = build_optimizer(
        {"name": "adam", "lr": 1e-3, "betas": [0.9, 0.999], "eps": 1e-8,
         "weight_decay": 0}, None, max_iters=10, trainable=mask,
        gradient_clip=1.0)
    step = parallel.make_train_step(model, loss_fn, tx, donate=False,
                                    trainable=mask)

    state_a = (params, tx.init(params), {}, jax.random.key(7))
    state_b = (cast, tx.init(cast), {}, jax.random.key(7))
    for i in range(3):
        b = _batch(np.random.default_rng(i + 1))
        state_a, ma = step(state_a, b)
        state_b, mb = step(state_b, b)
        assert float(ma["loss"]) == float(mb["loss"]), f"step {i}"

    fa, fb = (jax.tree_util.tree_leaves(state_a[0]),
              jax.tree_util.tree_leaves(state_b[0]))
    for a, b, t in zip(fa, fb, flat_m):
        if t:  # trainable: bitwise-equal updates
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        elif b.dtype == jnp.bfloat16 and a.dtype == jnp.float32:
            # big frozen leaf: untouched by the optimizer, bf16 == cast(f32)
            np.testing.assert_array_equal(
                np.asarray(a, dtype=np.float32).astype(jnp.bfloat16),
                np.asarray(b))
        else:  # small frozen leaf: stays f32 in both arms, untouched
            assert b.dtype == a.dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_precast_config_default_on():
    from bifold_tpu.config import compose
    cfg = compose([])
    assert bool(cfg["precast_frozen"]) is True


def test_precast_noop_for_f32_compute():
    rng = np.random.default_rng(0)
    model, _ = _build()
    batch = _batch(rng)
    params = jax.jit(lambda: model.init(
        jax.random.key(0), batch, deterministic=True))()["params"]
    mask = trainable_mask(params, lora=True)
    out = precast_frozen(params, mask, jnp.float32)
    assert out is params
    out = precast_frozen(params, mask, None)
    assert out is params


def _forward_equality(model, sample, *, lora, extra_vars=None, rngs=None):
    """init -> precast big frozen leaves -> bitwise-equal forward."""
    variables = jax.jit(lambda: model.init(
        jax.random.key(0), sample, deterministic=True))()
    params = variables["params"]
    mask = trainable_mask(params, lora=lora)
    cast = precast_frozen(params, mask, jnp.bfloat16, min_size=1024)
    changed = [(a, b) for a, b in zip(jax.tree_util.tree_leaves(params),
                                      jax.tree_util.tree_leaves(cast))
               if a.dtype != b.dtype]
    assert changed, "no frozen leaf was cast — the lever is a no-op"
    extra = {k: v for k, v in variables.items() if k != "params"}

    def fwd(p):
        return model.apply({"params": p, **extra}, sample,
                           deterministic=True)

    a = jax.jit(fwd)(params)
    b = jax.jit(fwd)(cast)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_precast_forward_equal_rgb_clip():
    """ADVICE r4: the trainer precasts ALL families — rgb_clip's frozen
    clip_encoder must be value-identical cast-at-use vs precast."""
    from bifold_tpu.models.backbones import clip_backbone as CB

    tiny = CB.ClipConfig(image_size=IMG, patch_size=16, vision_width=64,
                         vision_layers=2, vision_heads=4, text_width=32,
                         text_layers=2, text_heads=4, context_length=16,
                         vocab_size=1000, embed_dim=32)
    orig = dict(CB.CLIP_CONFIGS)
    CB.CLIP_CONFIGS["tiny_precast"] = tiny
    try:
        model = build_model({
            "name": "rgb_clip", "image_size": IMG, "is_bimanual": False,
            "patch_size": 16, "text_encoder": "tiny_precast", "depth": 2,
            "heads": 4, "mlp_ratio": 2, "dropout": 0.0,
        }, dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        sample = {
            "rgb": jnp.asarray(rng.standard_normal((2, 3, IMG, IMG)),
                               jnp.float32),
            "mask": jnp.asarray((rng.random((2, 1, IMG, IMG)) > 0.5),
                                jnp.float32),
            "instruction": jnp.asarray(rng.integers(0, 1000, (2, 16)),
                                       jnp.int32),
        }
        _forward_equality(model, sample, lora=False)
    finally:
        CB.CLIP_CONFIGS.clear()
        CB.CLIP_CONFIGS.update(orig)


def test_precast_forward_equal_text_unet(tmp_path):
    """text_unet's frozen T5 text_encoder under precast: bitwise-equal
    forward (BatchNorm extra_vars ride along untouched)."""
    import json

    (tmp_path / "config.json").write_text(json.dumps({
        "model_type": "t5", "vocab_size": 100, "d_model": 32, "d_kv": 16,
        "d_ff": 64, "num_layers": 2, "num_heads": 2,
        "feed_forward_proj": "gated-gelu"}))
    model = build_model({
        "name": "text_unet", "image_size": IMG, "is_bimanual": False,
        "text_encoder": str(tmp_path), "features": [4, 8],
    }, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    sample = {
        "depth": jnp.asarray(rng.random((2, 1, IMG, IMG)), jnp.float32),
        "instruction": jnp.asarray(rng.integers(0, 100, (2, 16)), jnp.int32),
    }
    _forward_equality(model, sample, lora=False)

"""The T5 branch of TextConditionedUNet (reference text_unet.py:56-59,107).

When ``text_encoder`` is not a CLIP model name, the reference constructs
``T5EncoderModel.from_pretrained(text_encoder)`` and pools
``last_hidden_state[:, 0]``. These tests pin our from-scratch T5 encoder
(models/backbones/t5_backbone.py) against the HF torch implementation on
random tiny weights — both FFN variants — plus the converter round-trip,
the full text_unet-with-T5 forward, the loud unknown-name error (the old
code silently fell back to ViT-B/16, VERDICT r4 missing #1), and the
trainer's from_pretrained-equivalent weight graft.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from transformers import T5Config as HFT5Config  # noqa: E402
from transformers import T5EncoderModel  # noqa: E402

from bifold_tpu.models.backbones import T5Config, T5Encoder, resolve_t5_config  # noqa: E402
from bifold_tpu.models.convert import convert_t5, convert_t5_inverse  # noqa: E402

VOCAB, DM, DKV, DFF, LAYERS, HEADS = 100, 32, 16, 64, 2, 2


def _tiny_pair(ff: str, dropout: float = 0.0):
    hf = HFT5Config(vocab_size=VOCAB, d_model=DM, d_kv=DKV, d_ff=DFF,
                    num_layers=LAYERS, num_heads=HEADS, dropout_rate=dropout,
                    feed_forward_proj=ff)
    torch.manual_seed(0)
    ref = T5EncoderModel(hf).eval()
    ours = T5Encoder(cfg=T5Config(
        vocab_size=VOCAB, d_model=DM, d_kv=DKV, d_ff=DFF, num_layers=LAYERS,
        num_heads=HEADS, dropout_rate=dropout, feed_forward_proj=ff))
    return ref, ours


@pytest.mark.parametrize("ff", ["relu", "gated-gelu"])
def test_t5_encoder_matches_hf(ff):
    ref, ours = _tiny_pair(ff)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_t5(sd)
    ids = np.random.default_rng(0).integers(0, VOCAB, (2, 16))
    with torch.no_grad():
        want = ref(torch.tensor(ids).long()).last_hidden_state.numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(ids)))
    assert np.abs(got - want).max() < 1e-4


@pytest.mark.parametrize("ff", ["relu", "gated-gelu"])
def test_t5_param_layout_matches_init(ff):
    """Converted params must graft cleanly onto a fresh init (same tree,
    same shapes) — catches silent layout drift between converter and
    module."""
    ref, ours = _tiny_pair(ff)
    params = convert_t5({k: v.numpy() for k, v in ref.state_dict().items()})
    init = ours.init(jax.random.key(0), jnp.zeros((1, 8), jnp.int32))["params"]
    ka = {jax.tree_util.keystr(p): np.shape(v)
          for p, v in jax.tree_util.tree_leaves_with_path(init)}
    kb = {jax.tree_util.keystr(p): np.shape(v)
          for p, v in jax.tree_util.tree_leaves_with_path(params)}
    assert ka == kb


def test_t5_inverse_roundtrip_bitwise():
    ref, _ = _tiny_pair("gated-gelu")
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    inv = convert_t5_inverse(convert_t5(sd))
    for k, v in sd.items():
        np.testing.assert_array_equal(inv[k], v, err_msg=k)
    missing, unexpected = ref.load_state_dict(
        {k: torch.tensor(np.ascontiguousarray(v)) for k, v in inv.items()},
        strict=False)
    assert not missing and not unexpected, (missing, unexpected)


def test_resolve_t5_config():
    cfg = resolve_t5_config("t5-small")
    assert cfg.d_model == 512 and cfg.feed_forward_proj == "relu"
    assert resolve_t5_config("google/flan-t5-base").feed_forward_proj == \
        "gated-gelu"
    with pytest.raises(ValueError, match="neither a CLIP model"):
        resolve_t5_config("bert-base-uncased")


def test_resolve_t5_config_from_dir(tmp_path):
    (tmp_path / "config.json").write_text(json.dumps({
        "model_type": "t5", "vocab_size": VOCAB, "d_model": DM, "d_kv": DKV,
        "d_ff": DFF, "num_layers": LAYERS, "num_heads": HEADS,
        "feed_forward_proj": "gated-gelu"}))
    cfg = resolve_t5_config(str(tmp_path))
    assert cfg.d_model == DM and cfg.feed_forward_proj == "gated-gelu"
    (tmp_path / "config.json").write_text(json.dumps({"model_type": "bert"}))
    with pytest.raises(ValueError, match="model_type"):
        resolve_t5_config(str(tmp_path))


def test_text_unet_unknown_encoder_is_loud():
    """The old code silently mapped unknown names onto ViT-B/16; a config
    that asked for T5 ran the wrong encoder without an error."""
    from bifold_tpu.models import build_model

    model = build_model({
        "name": "text_unet", "image_size": 32, "is_bimanual": False,
        "text_encoder": "definitely-not-a-model", "features": [4, 8],
    })
    sample = {"depth": jnp.zeros((1, 1, 32, 32)),
              "instruction": jnp.zeros((1, 8), jnp.int32)}
    with pytest.raises(ValueError, match="neither a CLIP model"):
        model.init(jax.random.key(0), sample, deterministic=True)


def _save_tiny_t5(d, ff="gated-gelu", seed=1):
    hf = HFT5Config(vocab_size=VOCAB, d_model=DM, d_kv=DKV, d_ff=DFF,
                    num_layers=LAYERS, num_heads=HEADS, dropout_rate=0.1,
                    feed_forward_proj=ff)
    torch.manual_seed(seed)
    enc = T5EncoderModel(hf).eval()
    enc.save_pretrained(str(d), safe_serialization=True)
    return enc


def test_trainer_loads_pretrained_t5(tmp_path):
    """from_pretrained semantics: a weights-bearing local T5 dir grafts into
    the trainer's text_encoder subtree at init; a config.json-only dir
    stays randomly initialized."""
    from bifold_tpu.config import Config, compose
    from bifold_tpu.trainer import Trainer

    t5_dir = tmp_path / "tiny-t5"
    enc = _save_tiny_t5(t5_dir, ff="relu", seed=3)
    cfg = compose([
        "train_dataset=synthetic", "test_dataset=null", "model=text_unet",
        "train_dataset.n_samples=8", "train_dataset.image_size=32",
        "model.image_size=32", f"model.text_encoder={t5_dir}",
        "model.features=[4,8]", "epochs=1", "eval_epochs=1", "batch_size=8",
        "test_batch_size=8", "simulator=null", "steps_per_dispatch=1",
        f"run_dir={tmp_path}/run", "log_every=1",
    ])
    trainer = Trainer(Config(cfg), run_dir=f"{tmp_path}/run")
    got = np.asarray(trainer.params["text_encoder"]["shared"]["embedding"])
    want = enc.state_dict()["shared.weight"].numpy()
    np.testing.assert_array_equal(got, want)
    # and the T5 tower is frozen (reference frozen_submodule("text_encoder"))
    from bifold_tpu.models import trainable_mask
    mask = trainable_mask(trainer.params, lora=False)
    assert not any(jax.tree_util.tree_leaves(mask["text_encoder"]))
    # one training step runs end-to-end
    trainer.prepare_train()
    loss = trainer.train_epoch()
    assert np.isfinite(loss)


def test_resolve_t5_config_null_is_valueerror():
    """Path(None) used to raise an opaque TypeError; the documented contract
    is ValueError for anything that is not a name or a checkpoint dir."""
    for bogus in (None, ""):
        with pytest.raises(ValueError, match="neither a CLIP model"):
            resolve_t5_config(bogus)


def test_registry_t5_hash_fallback_caps_vocab():
    """Offline, a REGISTRY T5 name (no local dir) must hash into the
    embedding table T5_CONFIGS builds for it — 49408 CLIP-sized buckets
    against a 32128-row nn.Embed would silently clamp a third of all ids
    onto the last row."""
    from bifold_tpu.data.tokenizers import HashTokenizer, build_tokenizer
    from bifold_tpu.models.backbones.t5_backbone import T5_CONFIGS

    with pytest.warns(UserWarning, match="falling back"):
        tok = build_tokenizer("t5-small")
    assert isinstance(tok, HashTokenizer)
    assert tok.vocab_size == T5_CONFIGS["t5-small"].vocab_size
    ids = tok("fold the towel")
    assert ids.max() < T5_CONFIGS["t5-small"].vocab_size


def test_vit_l_336_dispatches_to_clip_text_tower():
    """ViT-L/14@336px is in the reference _MODELS (and CLIP_MODEL_NAMES);
    after the silent-T5-fallback removal it must still route to the CLIP
    text tower, not raise in resolve_t5_config."""
    from bifold_tpu.models import build_model

    model = build_model({
        "name": "text_unet", "image_size": 32, "is_bimanual": False,
        "text_encoder": "ViT-L/14@336px", "features": [4, 8],
    })
    sample = {"depth": jnp.zeros((1, 1, 32, 32)),
              "instruction": jnp.zeros((1, 8), jnp.int32)}
    params = model.init(jax.random.key(0), sample, deterministic=True)
    assert "clip_encoder" in params["params"]

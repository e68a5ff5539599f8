"""Pretrained-weight conversion parity: random-initialized torch SigLIP/CLIP
models (built from config — no downloads) vs our Flax towers with converted
weights. This is the BASELINE.md fidelity gate (heatmaps within 1e-2 of the
reference requires tower activations to match; we check <= 1e-4)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


def _tiny_siglip_cfgs():
    from transformers import SiglipConfig, SiglipTextConfig, SiglipVisionConfig

    vision = SiglipVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=16)
    text = SiglipTextConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, vocab_size=99, max_position_embeddings=16)
    return SiglipConfig(text_config=text.to_dict(), vision_config=vision.to_dict())


@pytest.mark.parametrize("lora", [False, True])
def test_siglip_conversion_parity(lora):
    import torch
    from transformers import SiglipModel

    from bifold_tpu.models.backbones import SiglipBackbone, SiglipConfig as OurCfg
    from bifold_tpu.models.convert import convert_siglip

    torch.manual_seed(0)
    hf = SiglipModel(_tiny_siglip_cfgs()).eval()
    sd = hf.state_dict()

    cfg = OurCfg(image_size=32, patch_size=16, hidden_size=64, layers=2,
                 heads=4, mlp_dim=128, vocab_size=99, max_text_len=16)
    ours = SiglipBackbone(cfg=cfg, lora_rank=8 if lora else 0, lora_alpha=16.0)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    ids = rng.integers(0, 99, (2, 16)).astype(np.int32)

    import jax
    params = ours.init(jax.random.key(0), jnp.asarray(ids),
                       jnp.asarray(pixels))["params"]
    converted = convert_siglip(sd, layers=2, lora=lora)
    from bifold_tpu.models.convert import graft
    params = graft({"m": params}, "m", converted)["m"]

    text_out, vis_out = ours.apply({"params": params}, jnp.asarray(ids),
                                   jnp.asarray(pixels))

    with torch.no_grad():
        hf_vis = hf.vision_model(torch.tensor(pixels)).last_hidden_state.numpy()
        hf_text = hf.text_model(torch.tensor(ids, dtype=torch.long)
                                ).last_hidden_state.numpy()

    assert np.abs(np.asarray(vis_out) - hf_vis).max() < 1e-4
    assert np.abs(np.asarray(text_out) - hf_text).max() < 1e-4


def test_clip_hf_conversion_parity():
    import torch
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    from bifold_tpu.models.backbones import ClipBackbone, ClipConfig as OurCfg
    from bifold_tpu.models.convert import convert_clip, graft

    torch.manual_seed(0)
    vision = CLIPVisionConfig(hidden_size=64, intermediate_size=256,
                              num_hidden_layers=2, num_attention_heads=4,
                              image_size=32, patch_size=16,
                              hidden_act="quick_gelu")
    # eos_token_id = the max id our tokens use: HF pools at the first EOS
    # position while (OpenAI) CLIP — and our tower — pool at argmax(ids);
    # with EOT = the unique max id the two conventions coincide.
    text = CLIPTextConfig(hidden_size=48, intermediate_size=192,
                          num_hidden_layers=2, num_attention_heads=4,
                          vocab_size=99, max_position_embeddings=12,
                          hidden_act="quick_gelu", eos_token_id=98)
    hf = CLIPModel(CLIPConfig(text_config=text.to_dict(),
                              vision_config=vision.to_dict(),
                              projection_dim=48)).eval()
    sd = hf.state_dict()

    cfg = OurCfg(image_size=32, patch_size=16, vision_width=64,
                 vision_layers=2, vision_heads=4, text_width=48, text_layers=2,
                 text_heads=4, context_length=12, vocab_size=99, embed_dim=48)
    ours = ClipBackbone(cfg=cfg)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    # EOT = max id, like CLIP's argmax pooling convention
    ids = rng.integers(1, 90, (2, 12)).astype(np.int32)
    ids[:, -1] = 98

    import jax
    params = ours.init(jax.random.key(0), jnp.asarray(ids),
                       jnp.asarray(pixels))["params"]
    params = graft({"m": params}, "m",
                   convert_clip(sd, vision_layers=2, text_layers=2))["m"]

    text_out, vis_out = ours.apply({"params": params}, jnp.asarray(ids),
                                   jnp.asarray(pixels))

    with torch.no_grad():
        hf_vis = hf.vision_model(torch.tensor(pixels))
        # our encode_image_with_embeddings = ln_post over ALL tokens; HF
        # applies post_layernorm only to the pooled CLS, so apply it manually
        hf_vis_all = hf.vision_model.post_layernorm(
            hf_vis.last_hidden_state).numpy()
        hf_text = hf.text_model(torch.tensor(ids, dtype=torch.long)
                                ).last_hidden_state.numpy()
        hf_pooled = hf.get_text_features(torch.tensor(ids, dtype=torch.long)).numpy()

    assert np.abs(np.asarray(vis_out) - hf_vis_all).max() < 1e-4
    assert np.abs(np.asarray(text_out) - hf_text).max() < 1e-4

    pooled = ours.apply({"params": params}, jnp.asarray(ids),
                        method=ClipBackbone.encode_text)
    assert np.abs(np.asarray(pooled) - hf_pooled).max() < 1e-4


def test_openai_naming_detected():
    """convert_clip dispatches on key naming; OpenAI-style fused in_proj is
    split into q/k/v correctly."""
    from bifold_tpu.models.convert import convert_clip

    rng = np.random.default_rng(0)
    d, p = 8, 16
    sd = {
        "visual.conv1.weight": rng.standard_normal((d, 3, p, p)).astype(np.float32),
        "visual.class_embedding": rng.standard_normal(d).astype(np.float32),
        "visual.positional_embedding": rng.standard_normal((5, d)).astype(np.float32),
        "visual.ln_pre.weight": np.ones(d, np.float32),
        "visual.ln_pre.bias": np.zeros(d, np.float32),
        "visual.ln_post.weight": np.ones(d, np.float32),
        "visual.ln_post.bias": np.zeros(d, np.float32),
        "token_embedding.weight": rng.standard_normal((9, d)).astype(np.float32),
        "positional_embedding": rng.standard_normal((7, d)).astype(np.float32),
        "ln_final.weight": np.ones(d, np.float32),
        "ln_final.bias": np.zeros(d, np.float32),
        "text_projection": rng.standard_normal((d, d)).astype(np.float32),
    }
    for tower, n in (("visual.transformer", 1), ("transformer", 1)):
        for i in range(n):
            pr = f"{tower}.resblocks.{i}"
            sd[f"{pr}.attn.in_proj_weight"] = rng.standard_normal(
                (3 * d, d)).astype(np.float32)
            sd[f"{pr}.attn.in_proj_bias"] = rng.standard_normal(3 * d).astype(np.float32)
            sd[f"{pr}.attn.out_proj.weight"] = rng.standard_normal((d, d)).astype(np.float32)
            sd[f"{pr}.attn.out_proj.bias"] = rng.standard_normal(d).astype(np.float32)
            for ln in ("ln_1", "ln_2"):
                sd[f"{pr}.{ln}.weight"] = np.ones(d, np.float32)
                sd[f"{pr}.{ln}.bias"] = np.zeros(d, np.float32)
            sd[f"{pr}.mlp.c_fc.weight"] = rng.standard_normal((4 * d, d)).astype(np.float32)
            sd[f"{pr}.mlp.c_fc.bias"] = rng.standard_normal(4 * d).astype(np.float32)
            sd[f"{pr}.mlp.c_proj.weight"] = rng.standard_normal((d, 4 * d)).astype(np.float32)
            sd[f"{pr}.mlp.c_proj.bias"] = rng.standard_normal(d).astype(np.float32)

    out = convert_clip(sd, vision_layers=1, text_layers=1, scan_layers=False)
    blk = out["visual"]["transformer"]["block_0"]
    w = sd["visual.transformer.resblocks.0.attn.in_proj_weight"]
    np.testing.assert_array_equal(blk["attn"]["q_proj"]["kernel"], w[:d].T)
    np.testing.assert_array_equal(blk["attn"]["v_proj"]["kernel"], w[2 * d:].T)
    assert out["visual"]["conv1"]["kernel"].shape == (p, p, 3, d)
    # depth-1 towers NEVER use the scan-stacked layout, even with
    # scan_layers=True: Transformer names the single layer block_0
    # (layers.py `scan_layers and depth > 1`), so a stacked blocks/block
    # tree would be un-graftable
    out_scan = convert_clip(sd, vision_layers=1, text_layers=1,
                            scan_layers=True)
    assert "block_0" in out_scan["visual"]["transformer"]
    assert "blocks" not in out_scan["visual"]["transformer"]


def test_load_state_dict_sharded_dir(tmp_path):
    """HF save_pretrained shards checkpoints over ~2GB into
    model-0000N-of-0000M.safetensors + model.safetensors.index.json; a
    sharded dir used to be silently treated as config-only (random init)."""
    from safetensors.numpy import save_file

    from bifold_tpu.models.convert import load_state_dict

    rng = np.random.default_rng(0)
    a = {"shared.weight": rng.standard_normal((4, 3)).astype(np.float32)}
    b = {"block.0.w": rng.standard_normal((2, 2)).astype(np.float32),
         "final.bias": rng.standard_normal((2,)).astype(np.float32)}
    save_file(a, str(tmp_path / "model-00001-of-00002.safetensors"))
    save_file(b, str(tmp_path / "model-00002-of-00002.safetensors"))
    import json
    (tmp_path / "model.safetensors.index.json").write_text(json.dumps({
        "metadata": {"total_size": 0},
        "weight_map": {k: "model-00001-of-00002.safetensors" for k in a}
        | {k: "model-00002-of-00002.safetensors" for k in b}}))
    sd = load_state_dict(tmp_path)
    assert set(sd) == set(a) | set(b)
    np.testing.assert_array_equal(sd["shared.weight"], a["shared.weight"])
    np.testing.assert_array_equal(sd["final.bias"], b["final.bias"])

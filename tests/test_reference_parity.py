"""End-to-end output parity against the REFERENCE implementation itself.

Runs /root/reference/bifold/models/siglip.py (SigLip + SiglipSequential with
the ConvDecoder head, LoRA on and off) on the same inputs as our Flax models
with the full state dict converted via models/convert.convert_bifold, and
asserts every heatmap matches to 1e-4 (BASELINE.md fidelity gate: 1e-2) and
the decoded Action is identical. This closes the gap left by tower-level
tests: modality tokens, context position embeds, the fusion transformer with
the reference's query-mask quirk (legacy_query_mask=True), ConvDecoder
upsampling and sigmoid all run in one shot.

The reference model is instantiated from a tiny HF SigLIP saved to a local
directory (no network), exactly the path its AutoModel.from_pretrained takes.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# the reference's modules.py imports timm at module scope solely for the
# TransformerDecoder head (absent here); stub it so the ConvDecoder path —
# the shipped configuration — is importable
if "timm" not in sys.modules:
    import importlib.machinery

    def _stub(name):
        mod = types.ModuleType(name)
        # a real ModuleSpec so importlib.util.find_spec (transformers probes
        # for timm at import time) doesn't choke on __spec__ = None
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
        return mod

    timm = _stub("timm")
    timm_models = _stub("timm.models")
    timm_vit = _stub("timm.models.vision_transformer")
    timm_vit.Block = object
    timm.models = timm_models
    timm_models.vision_transformer = timm_vit

# the reference's clip/__init__.py imports torchvision only for its image
# preprocessing transform (which these tests never execute on an image);
# stub the six names it pulls in
if "torchvision" not in sys.modules:
    import importlib.machinery

    def _stub_tv(name):
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
        return mod

    class _TvCallable:  # accepts any ctor args; composes/called -> identity
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    tv = _stub_tv("torchvision")
    tv_transforms = _stub_tv("torchvision.transforms")
    for cls in ("CenterCrop", "Compose", "Normalize", "Resize", "ToTensor"):
        setattr(tv_transforms, cls, _TvCallable)
    tv_transforms.InterpolationMode = types.SimpleNamespace(
        BICUBIC="bicubic", BILINEAR="bilinear", NEAREST="nearest")
    tv.transforms = tv_transforms

# clip's simple_tokenizer imports ftfy for text cleanup; these tests feed
# integer token ids, never raw text, so unicode fixing is never reached
if "ftfy" not in sys.modules:
    import importlib.machinery

    ftfy = types.ModuleType("ftfy")
    ftfy.__spec__ = importlib.machinery.ModuleSpec("ftfy", loader=None)
    ftfy.fix_text = lambda s: s
    sys.modules["ftfy"] = ftfy

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

IMG, PATCH, DIM, TEXT_LEN, CTX = 32, 16, 64, 16, 2


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    """Tiny HF SigLIP checkpoint on disk, matching our 'tiny' base config
    (layers=2, heads=4, mlp 256) at hidden size 64."""
    from transformers import (
        SiglipConfig,
        SiglipModel,
        SiglipTextConfig,
        SiglipVisionConfig,
    )

    torch.manual_seed(0)
    vision = SiglipVisionConfig(
        hidden_size=DIM, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, image_size=IMG, patch_size=PATCH)
    text = SiglipTextConfig(
        hidden_size=DIM, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, vocab_size=32000, max_position_embeddings=64)
    model = SiglipModel(SiglipConfig(text_config=text.to_dict(),
                                     vision_config=vision.to_dict()))
    out = tmp_path_factory.mktemp("hf_siglip")
    model.save_pretrained(str(out))
    return str(out)


def _sample(bimanual: bool, sequential: bool, batch: int = 2):
    rng = np.random.default_rng(7)
    s = {
        "rgb": rng.standard_normal((batch, 3, IMG, IMG)).astype(np.float32),
        "instruction": rng.integers(0, 32000, (batch, TEXT_LEN)).astype(np.int32),
        "mask": (rng.random((batch, 1, IMG, IMG)) > 0.4).astype(np.float32),
    }
    if sequential:
        s["rgb_context"] = rng.standard_normal(
            (batch, CTX, 3, IMG, IMG)).astype(np.float32)
        s["context_attention_mask"] = np.array(
            [[1, 0], [1, 1]][:batch], np.int32)
    return s


def _torchify(sample):
    t = {k: torch.tensor(v) for k, v in sample.items()}
    t["instruction"] = t["instruction"].long()
    return t


def _reference_model(hf_dir, *, sequential, bimanual, lora):
    from bifold.models.siglip import SigLip, SiglipSequential

    torch.manual_seed(1)
    kwargs = dict(
        patch_size=PATCH, dim=DIM, lora=lora, r=8, lora_alpha=32,
        lora_dropout=0.0, automodel_name=hf_dir,
        target_modules=["q_proj", "v_proj"],
        pick_place_model="pick_place_convdecoder",
        image_size=IMG, is_bimanual=bimanual, device="cpu",
        fusion_model="concat_transformer", depth=2, heads=4, mlp_ratio=4,
        dropout=0.0,
    )
    if sequential:
        model = SiglipSequential(CTX, **kwargs)
    else:
        model = SigLip(**kwargs)
    if lora:
        # wake the adapters up: peft inits lora_B to zero (a no-op); give it
        # real values so the test covers the LoRA math, not just the base path
        g = torch.Generator().manual_seed(2)
        for name, p in model.named_parameters():
            if "lora_B" in name:
                with torch.no_grad():
                    p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return model.eval()


def _our_model(*, sequential, bimanual, lora):
    from bifold_tpu.models import build_model

    cfg = {
        "name": "siglip_sequential" if sequential else "siglip",
        "image_size": IMG, "is_bimanual": bimanual, "patch_size": PATCH,
        "automodel_name": "tiny", "dim": DIM, "lora": lora, "r": 8,
        "lora_alpha": 32.0, "lora_dropout": 0.0, "depth": 2, "heads": 4,
        "mlp_ratio": 4, "dropout": 0.0, "threshold": 0.01,
        # the reference masks over the query dim (transformer.py:33-35)
        "legacy_query_mask": True,
    }
    if sequential:
        cfg["context_length"] = CTX
    return build_model(cfg)


@pytest.mark.parametrize("sequential,bimanual,lora", [
    (False, False, False),
    (False, False, True),
    (True, True, True),
])
def test_full_forward_parity(hf_dir, sequential, bimanual, lora):
    import jax
    import jax.numpy as jnp

    from bifold_tpu.models.convert import convert_bifold, graft

    ref = _reference_model(hf_dir, sequential=sequential, bimanual=bimanual,
                           lora=lora)
    sample = _sample(bimanual, sequential)
    with torch.no_grad():
        ref_out = ref(_torchify(sample))

    ours = _our_model(sequential=sequential, bimanual=bimanual, lora=lora)
    jb = {k: jnp.asarray(v) for k, v in sample.items()}
    params = jax.jit(
        lambda: ours.init(jax.random.key(0), jb, deterministic=True)
    )()["params"]
    converted = convert_bifold(ref.state_dict())
    params = graft({"m": params}, "m", converted)["m"]
    out = jax.jit(
        lambda p, b: ours.apply({"params": p}, b, deterministic=True)
    )(params, jb)

    heads = (["left_pick", "right_pick", "left_place", "right_place"]
             if bimanual else ["pick", "place"])
    for h in heads:
        ref_hm = ref_out[f"{h}_heatmap"].numpy()
        our_hm = np.asarray(out[f"{h}_heatmap"])
        assert our_hm.shape == ref_hm.shape
        err = np.abs(our_hm - ref_hm).max()
        assert err < 1e-4, f"{h}_heatmap max err {err}"


@pytest.mark.skipif(
    __import__("os").environ.get("BIFOLD_FULLSCALE", "") in ("", "0"),
    reason="full-scale parity is CPU-minutes; opt in with BIFOLD_FULLSCALE=1 "
           "(run once per round)")
def test_full_forward_parity_fullscale(tmp_path):
    """Parity at the SHIPPED geometry (VERDICT r2 missing #3): SigLIP-base
    768-dim 12-layer towers at 384 px (576-patch grid), depth-8/16-head
    fusion over the full [text 64 | 3x577 ctx | 577 cur] ~2.4k-token
    sequence, LoRA r8 — where stacked-scan layouts, context pos-embed
    lengths and resize kernels have the most room to silently diverge.
    Asserts the BASELINE.md 1e-2 gate on every heatmap of one forward
    (reference shapes: conf/model/siglip_sequential.yaml,
    models/siglip.py:73-137)."""
    import jax
    import jax.numpy as jnp
    from transformers import (
        SiglipConfig,
        SiglipModel,
        SiglipTextConfig,
        SiglipVisionConfig,
    )

    from bifold_tpu.models import build_model
    from bifold_tpu.models.convert import convert_bifold, graft

    img, dim, ctx, text_len = 384, 768, 3, 64
    torch.manual_seed(0)
    vision = SiglipVisionConfig(
        hidden_size=dim, intermediate_size=3072, num_hidden_layers=12,
        num_attention_heads=12, image_size=img, patch_size=16)
    text = SiglipTextConfig(
        hidden_size=dim, intermediate_size=3072, num_hidden_layers=12,
        num_attention_heads=12, vocab_size=32000, max_position_embeddings=64)
    hf = SiglipModel(SiglipConfig(text_config=text.to_dict(),
                                  vision_config=vision.to_dict()))
    hf_dir = tmp_path / "hf_siglip_base"
    hf.save_pretrained(str(hf_dir))
    del hf

    from bifold.models.siglip import SiglipSequential

    torch.manual_seed(1)
    ref = SiglipSequential(
        ctx, patch_size=16, dim=dim, lora=True, r=8, lora_alpha=32,
        lora_dropout=0.0, automodel_name=str(hf_dir),
        target_modules=["q_proj", "v_proj"],
        pick_place_model="pick_place_convdecoder",
        image_size=img, is_bimanual=True, device="cpu",
        fusion_model="concat_transformer", depth=8, heads=16, mlp_ratio=4,
        dropout=0.0).eval()
    g = torch.Generator().manual_seed(2)
    for name, p in ref.named_parameters():
        if "lora_B" in name:  # wake the adapters (peft zero-inits lora_B)
            with torch.no_grad():
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    rng = np.random.default_rng(7)
    sample = {
        "rgb": rng.standard_normal((1, 3, img, img)).astype(np.float32),
        "instruction": rng.integers(0, 32000, (1, text_len)).astype(np.int32),
        "mask": (rng.random((1, 1, img, img)) > 0.4).astype(np.float32),
        "rgb_context": rng.standard_normal(
            (1, ctx, 3, img, img)).astype(np.float32),
        "context_attention_mask": np.array([[1, 1, 0]], np.int32),
    }
    with torch.no_grad():
        ref_out = ref(_torchify(sample))

    ours = build_model({
        "name": "siglip_sequential", "image_size": img, "is_bimanual": True,
        "patch_size": 16, "automodel_name": "google/siglip-base-patch16-384",
        "dim": dim, "lora": True, "r": 8, "lora_alpha": 32.0,
        "lora_dropout": 0.0, "depth": 8, "heads": 16, "mlp_ratio": 4,
        "dropout": 0.0, "threshold": 0.01, "context_length": ctx,
        "legacy_query_mask": True,
    })
    jb = {k: jnp.asarray(v) for k, v in sample.items()}
    params = jax.jit(
        lambda: ours.init(jax.random.key(0), jb, deterministic=True)
    )()["params"]
    converted = convert_bifold(ref.state_dict())
    del ref
    params = graft({"m": params}, "m", converted)["m"]
    del converted
    out = jax.jit(
        lambda p, b: ours.apply({"params": p}, b, deterministic=True)
    )(params, jb)

    for h in ("left_pick", "right_pick", "left_place", "right_place"):
        ref_hm = ref_out[f"{h}_heatmap"].numpy()
        our_hm = np.asarray(out[f"{h}_heatmap"])
        assert our_hm.shape == ref_hm.shape
        err = np.abs(our_hm - ref_hm).max()
        # BASELINE.md gate: within 1e-2 at the shipped configuration
        assert err < 1e-2, f"{h}_heatmap max err {err}"


def test_rgb_clip_full_forward_parity(tmp_path, monkeypatch):
    """End-to-end parity for the SECOND model family: the reference's
    RGBOnly (rgb_clip.py:9-80 — frozen vendored-CLIP encoders, vision->text
    projection, learned pos embeds, shared fusion+ConvDecoder head) vs our
    `rgb_clip`, with the full state dict through convert_bifold."""
    import jax
    import jax.numpy as jnp

    import bifold.models.clip as refclip
    from bifold.models.clip.model import CLIP
    from bifold.models.rgb_clip import RGBOnly as RefRGBOnly

    from bifold_tpu.models import build_model
    from bifold_tpu.models.backbones import clip_backbone as CB
    from bifold_tpu.models.convert import convert_bifold, graft

    img, width, ctx_len, vocab = 32, 64, 77, 512
    torch.manual_seed(0)
    tiny_clip = CLIP(embed_dim=64, image_resolution=img, vision_layers=2,
                     vision_width=width, vision_patch_size=16,
                     context_length=ctx_len, vocab_size=vocab,
                     transformer_width=width, transformer_heads=4,
                     transformer_layers=2).float()
    pt = tmp_path / "tiny_clip.pt"
    torch.save(tiny_clip.state_dict(), str(pt))
    # serve the tiny checkpoint through the reference's own build_model
    # (clip.load's jit-then-state-dict file dance chokes on a plain .pt
    # under this torch version; _MODELS still gates RGBOnly's assert)
    import bifold.models.rgb_clip as ref_rgb_mod
    monkeypatch.setitem(refclip._MODELS, "Tiny-Test", "local://tiny")

    def _fake_load(name, device="cpu", **kw):
        sd = torch.load(str(pt), map_location="cpu", weights_only=False)
        return refclip.build_model(sd).float(), None

    monkeypatch.setattr(ref_rgb_mod, "load", _fake_load)

    torch.manual_seed(1)
    ref = RefRGBOnly(
        patch_size=16, text_dropout=0.0, rgb_dropout=0.0,
        text_encoder="Tiny-Test",
        pick_place_model="pick_place_convdecoder",
        image_size=img, is_bimanual=False, device="cpu",
        fusion_model="concat_transformer", depth=2, heads=4, mlp_ratio=4,
        dropout=0.0).eval()

    rng = np.random.default_rng(3)
    sample = {
        "rgb": rng.standard_normal((2, 3, img, img)).astype(np.float32),
        # the vendored CLIP pads text to the full 77-token context
        "instruction": rng.integers(0, vocab, (2, ctx_len)).astype(np.int32),
        "mask": (rng.random((2, 1, img, img)) > 0.4).astype(np.float32),
    }
    with torch.no_grad():
        ref_out = ref(_torchify(sample))

    tiny_cfg = CB.ClipConfig(
        image_size=img, patch_size=16, vision_width=width, vision_layers=2,
        # clip.load -> build_model re-derives head counts from widths
        # (model.py:351,541: heads = width // 64) — 1 head each at this
        # tiny width, regardless of what the donor CLIP was built with
        vision_heads=width // 64, text_width=width, text_layers=2,
        text_heads=width // 64, context_length=ctx_len, vocab_size=vocab,
        embed_dim=64)
    monkeypatch.setitem(CB.CLIP_CONFIGS, "Tiny-Test", tiny_cfg)
    ours = build_model({
        "name": "rgb_clip", "image_size": img, "is_bimanual": False,
        "patch_size": 16, "text_encoder": "Tiny-Test", "depth": 2,
        "heads": 4, "mlp_ratio": 4, "dropout": 0.0, "threshold": 0.01,
        "legacy_query_mask": True,
    })
    jb = {k: jnp.asarray(v) for k, v in sample.items()}
    params = jax.jit(
        lambda: ours.init(jax.random.key(0), jb, deterministic=True)
    )()["params"]
    params = graft({"m": params}, "m", convert_bifold(ref.state_dict()))["m"]
    out = jax.jit(
        lambda p, b: ours.apply({"params": p}, b, deterministic=True)
    )(params, jb)

    for h in ("pick", "place"):
        ref_hm = ref_out[f"{h}_heatmap"].numpy()
        our_hm = np.asarray(out[f"{h}_heatmap"])
        assert our_hm.shape == ref_hm.shape
        err = np.abs(our_hm - ref_hm).max()
        assert err < 1e-4, f"{h}_heatmap max err {err}"


def test_text_unet_full_forward_parity(tmp_path, monkeypatch):
    """End-to-end parity for the THIRD model family: the reference's
    TextConditionedUNet (text_unet.py:47-140 — frozen CLIP-text FiLM
    conditioning, double-conv encoder, ConvTranspose+FiLM decoder,
    BatchNorm running stats) vs our `text_unet` via convert_text_unet."""
    import jax
    import jax.numpy as jnp

    import bifold.models.clip as refclip
    import bifold.models.text_unet as ref_unet_mod
    from bifold.models.clip.model import CLIP
    from bifold.models.text_unet import TextConditionedUNet as RefUNet

    from bifold_tpu.models import build_model
    from bifold_tpu.models.backbones import clip_backbone as CB
    from bifold_tpu.models.convert import convert_text_unet, graft

    img, width, ctx_len, vocab = 32, 64, 77, 512
    torch.manual_seed(0)
    tiny_clip = CLIP(64, img, 2, width, 16, ctx_len, vocab, width, 4, 2).float()
    sd0 = {k: v.clone() for k, v in tiny_clip.state_dict().items()}
    monkeypatch.setitem(refclip._MODELS, "Tiny-Test", "local://tiny")
    monkeypatch.setattr(
        ref_unet_mod, "load",
        lambda name, device="cpu", **kw: (refclip.build_model(dict(sd0)).float(), None))

    torch.manual_seed(1)
    features = (8, 16, 32)
    ref = RefUNet(text_encoder="Tiny-Test", features=list(features),
                  image_size=img, is_bimanual=True, device="cpu")
    rng = np.random.default_rng(5)
    # a few train-mode passes so BatchNorm running stats move off their
    # init — the conversion must carry REAL statistics, not (0, 1)
    ref.train()
    with torch.no_grad():
        for i in range(3):
            ref({"depth": torch.tensor(
                     rng.standard_normal((2, 1, img, img)).astype(np.float32)),
                 "instruction": torch.tensor(
                     rng.integers(0, vocab, (2, ctx_len))).long()})
    ref.eval()

    sample = {
        "depth": rng.standard_normal((2, 1, img, img)).astype(np.float32),
        "instruction": rng.integers(0, vocab, (2, ctx_len)).astype(np.int32),
    }
    with torch.no_grad():
        ref_out = ref(_torchify(sample))

    monkeypatch.setitem(CB.CLIP_CONFIGS, "Tiny-Test", CB.ClipConfig(
        image_size=img, patch_size=16, vision_width=width, vision_layers=2,
        vision_heads=width // 64, text_width=width, text_layers=2,
        text_heads=width // 64, context_length=ctx_len, vocab_size=vocab,
        embed_dim=64))
    ours = build_model({
        "name": "text_unet", "image_size": img, "is_bimanual": True,
        "text_encoder": "Tiny-Test", "features": list(features),
        "threshold": 0.01,
    })
    jb = {k: jnp.asarray(v) for k, v in sample.items()}
    variables = jax.jit(
        lambda: ours.init(jax.random.key(0), jb, deterministic=True))()
    conv_params, conv_stats = convert_text_unet(ref.state_dict())
    params = graft({"m": variables["params"]}, "m", conv_params)["m"]
    stats = graft({"m": variables["batch_stats"]}, "m", conv_stats)["m"]
    out = jax.jit(
        lambda v, b: ours.apply(v, b, deterministic=True)
    )({"params": params, "batch_stats": stats}, jb)

    for h in ("left_pick", "right_pick", "left_place", "right_place"):
        ref_hm = ref_out[f"{h}_heatmap"].numpy()
        our_hm = np.asarray(out[f"{h}_heatmap"])
        assert our_hm.shape == ref_hm.shape
        err = np.abs(our_hm - ref_hm).max()
        assert err < 1e-4, f"{h}_heatmap max err {err}"


def test_text_unet_t5_full_forward_parity(tmp_path):
    """End-to-end parity for the T5 BRANCH of TextConditionedUNet
    (text_unet.py:56-59: non-CLIP names go to
    T5EncoderModel.from_pretrained; :107 pools last_hidden_state[:, 0]) —
    reference constructed from a local tiny T5 checkpoint dir vs our
    text_unet via convert_text_unet, every heatmap <= 1e-4, plus the
    bitwise inverse round-trip of the T5 subtree."""
    import jax
    import jax.numpy as jnp
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    from bifold.models.text_unet import TextConditionedUNet as RefUNet

    from bifold_tpu.models import build_model
    from bifold_tpu.models.convert import (convert_text_unet,
                                           convert_text_unet_inverse, graft)

    vocab = 100
    t5_dir = tmp_path / "tiny-t5"
    hf_cfg = HFT5Config(vocab_size=vocab, d_model=32, d_kv=16, d_ff=64,
                        num_layers=2, num_heads=2, dropout_rate=0.1,
                        feed_forward_proj="gated-gelu")
    torch.manual_seed(1)
    T5EncoderModel(hf_cfg).eval().save_pretrained(
        str(t5_dir), safe_serialization=True)

    img, features = 32, (8, 16)
    torch.manual_seed(2)
    ref = RefUNet(text_encoder=str(t5_dir), features=list(features),
                  image_size=img, is_bimanual=True, device="cpu")
    rng = np.random.default_rng(5)
    ref.train()
    with torch.no_grad():
        for _ in range(3):  # move BN running stats off init
            ref({"depth": torch.tensor(
                     rng.standard_normal((2, 1, img, img)).astype(np.float32)),
                 "instruction": torch.tensor(
                     rng.integers(0, vocab, (2, 16))).long()})
    ref.eval()

    sample = {
        "depth": rng.standard_normal((2, 1, img, img)).astype(np.float32),
        "instruction": rng.integers(0, vocab, (2, 16)).astype(np.int32),
    }
    with torch.no_grad():
        ref_out = ref(_torchify(sample))

    ours = build_model({
        "name": "text_unet", "image_size": img, "is_bimanual": True,
        "text_encoder": str(t5_dir), "features": list(features),
    })
    jb = {k: jnp.asarray(v) for k, v in sample.items()}
    variables = jax.jit(
        lambda: ours.init(jax.random.key(0), jb, deterministic=True))()
    conv_params, conv_stats = convert_text_unet(ref.state_dict())
    params = graft({"m": variables["params"]}, "m", conv_params)["m"]
    stats = graft({"m": variables["batch_stats"]}, "m", conv_stats)["m"]
    out = jax.jit(lambda v, b: ours.apply(v, b, deterministic=True))(
        {"params": params, "batch_stats": stats}, jb)
    for h in ("left_pick", "right_pick", "left_place", "right_place"):
        err = np.abs(np.asarray(out[f"{h}_heatmap"])
                     - ref_out[f"{h}_heatmap"].numpy()).max()
        assert err < 1e-4, f"{h}_heatmap max err {err}"

    # inverse: T5 subtree round-trips bitwise into the reference naming
    inv = convert_text_unet_inverse(params, stats)
    sd = ref.state_dict()
    for k in sd:
        if k.startswith("text_encoder."):
            np.testing.assert_array_equal(np.asarray(inv[k]),
                                          sd[k].numpy(), err_msg=k)


def test_decoded_action_parity(hf_dir):
    """Same decoded Action as the reference's get_action: argmax + mask snap +
    dual-arm confidence gating (at the reference's hardcoded 0.01)."""
    import jax.numpy as jnp

    import jax

    from bifold_tpu.models import get_action
    from bifold_tpu.models.convert import convert_bifold, graft

    ref = _reference_model(hf_dir, sequential=True, bimanual=True, lora=True)
    sample = _sample(True, True)
    tsample = _torchify(sample)
    ref_action = ref.get_action(tsample)

    ours = _our_model(sequential=True, bimanual=True, lora=True)
    jb = {k: jnp.asarray(v) for k, v in sample.items()}
    params = jax.jit(
        lambda: ours.init(jax.random.key(0), jb, deterministic=True)
    )()["params"]
    params = graft({"m": params}, "m", convert_bifold(ref.state_dict()))["m"]
    action = get_action(ours, {"params": params}, jb, threshold=0.01)

    for field in ("left_pick", "right_pick", "left_place", "right_place"):
        np.testing.assert_allclose(
            np.asarray(getattr(action, field), np.float64),
            np.asarray(getattr(ref_action, field), np.float64),
            err_msg=field)


def test_convert_cli_ingests_trainer_checkpoint(hf_dir, tmp_path, monkeypatch):
    """The published-checkpoint path end to end: a reference-Trainer-style
    .pth ({"model": state_dict, "epoch": ...}, reference __main__.py:304-325)
    through the `python -m bifold_tpu.models.convert --arch bifold` CLI, the
    pickle grafted onto a fresh model, and the forward matching the torch
    model — the workflow a user follows with the released BiFold weights."""
    import pickle

    import jax
    import jax.numpy as jnp

    from bifold_tpu.models import convert as convert_mod
    from bifold_tpu.models.convert import graft

    ref = _reference_model(hf_dir, sequential=False, bimanual=False, lora=True)
    ckpt = tmp_path / "best.pth"
    torch.save({"model": ref.state_dict(), "epoch": 3,
                "tracked_metric": 1.0}, str(ckpt))

    out_pkl = tmp_path / "bifold_params.pkl"
    monkeypatch.setattr(sys, "argv", [
        "convert", "--checkpoint", str(ckpt), "--arch", "bifold",
        "--out", str(out_pkl)])
    convert_mod.main()

    converted = pickle.loads(out_pkl.read_bytes())
    ours = _our_model(sequential=False, bimanual=False, lora=True)
    sample = _sample(False, False)
    jb = {k: jnp.asarray(v) for k, v in sample.items()}
    params = jax.jit(
        lambda: ours.init(jax.random.key(0), jb, deterministic=True)
    )()["params"]
    params = graft({"m": params}, "m", converted)["m"]
    out = jax.jit(
        lambda p, b: ours.apply({"params": p}, b, deterministic=True)
    )(params, jb)

    with torch.no_grad():
        ref_out = ref(_torchify(sample))
    for h in ("pick", "place"):
        err = np.abs(np.asarray(out[f"{h}_heatmap"])
                     - ref_out[f"{h}_heatmap"].numpy()).max()
        assert err < 1e-4, f"{h}_heatmap max err {err}"


@pytest.mark.parametrize("sequential,bimanual,lora", [
    (False, False, False),
    (True, True, True),
])
def test_inverse_conversion_roundtrip(hf_dir, sequential, bimanual, lora):
    """convert_bifold_inverse deploys our params BACK into the reference's
    torch tooling: ref -> convert_bifold -> convert_bifold_inverse loads
    into a DIFFERENTLY-initialized reference model bitwise, the only keys
    left untouched are the ones the bifold forward never reads (HF pooling
    heads, logit scale/bias, position_ids buffers), and the reloaded model
    reproduces the original's heatmaps exactly."""
    from bifold_tpu.models.convert import convert_bifold, convert_bifold_inverse

    ref = _reference_model(hf_dir, sequential=sequential, bimanual=bimanual,
                           lora=lora)
    params = convert_bifold(ref.state_dict())
    inv = convert_bifold_inverse(params)

    torch.manual_seed(99)  # a genuinely different init to overwrite
    ref2 = _reference_model(hf_dir, sequential=sequential, bimanual=bimanual,
                            lora=lora)
    missing, unexpected = ref2.load_state_dict(
        {k: torch.tensor(np.ascontiguousarray(v)) for k, v in inv.items()},
        strict=False)
    assert not unexpected, f"inverse emitted unknown keys: {unexpected[:5]}"
    allowed = ("position_ids", "logit_scale", "logit_bias", ".head.",
               "head.probe", "head.attention", "head.layernorm", "head.mlp")
    bad = [m for m in missing if not any(a in m for a in allowed)]
    assert not bad, f"forward-relevant keys not emitted: {bad[:8]}"

    # every emitted key landed bitwise
    sd1 = ref.state_dict()
    for k, v in inv.items():
        np.testing.assert_array_equal(
            np.asarray(v), sd1[k].numpy(), err_msg=k)

    # and the reloaded reference reproduces the original forward exactly
    sample = _torchify(_sample(bimanual, sequential))
    with torch.no_grad():
        o1, o2 = ref(sample), ref2(sample)
    heads = (["left_pick", "right_pick", "left_place", "right_place"]
             if bimanual else ["pick", "place"])
    for h in heads:
        np.testing.assert_array_equal(o2[f"{h}_heatmap"].numpy(),
                                      o1[f"{h}_heatmap"].numpy())


def test_rgb_clip_inverse_conversion_roundtrip(tmp_path, monkeypatch):
    """Inverse conversion for the rgb_clip family: ref RGBOnly ->
    convert_bifold -> convert_bifold_inverse loads back into a
    differently-initialized RGBOnly bitwise and reproduces its forward."""
    import bifold.models.clip as refclip
    import bifold.models.rgb_clip as ref_rgb_mod
    from bifold.models.clip.model import CLIP
    from bifold.models.rgb_clip import RGBOnly as RefRGBOnly

    from bifold_tpu.models.convert import convert_bifold, convert_bifold_inverse

    img, width, ctx_len, vocab = 32, 64, 77, 512
    torch.manual_seed(0)
    tiny_clip = CLIP(64, img, 2, width, 16, ctx_len, vocab, width, 4, 2).float()
    sd0 = {k: v.clone() for k, v in tiny_clip.state_dict().items()}
    monkeypatch.setitem(refclip._MODELS, "Tiny-Test", "local://tiny")
    monkeypatch.setattr(
        ref_rgb_mod, "load",
        lambda name, device="cpu", **kw: (refclip.build_model(dict(sd0)).float(), None))

    def make(seed):
        torch.manual_seed(seed)
        return RefRGBOnly(
            patch_size=16, text_dropout=0.0, rgb_dropout=0.0,
            text_encoder="Tiny-Test",
            pick_place_model="pick_place_convdecoder",
            image_size=img, is_bimanual=False, device="cpu",
            fusion_model="concat_transformer", depth=2, heads=4, mlp_ratio=4,
            dropout=0.0).eval()

    ref, ref2 = make(1), make(77)
    inv = convert_bifold_inverse(convert_bifold(ref.state_dict()))
    missing, unexpected = ref2.load_state_dict(
        {k: torch.tensor(np.ascontiguousarray(v)) for k, v in inv.items()},
        strict=False)
    assert not unexpected, unexpected[:5]
    # allowed-missing: logit_scale, fused-attention mask buffers, and
    # visual.proj — forward_with_embeddings (model.py:296-317) returns the
    # pre-projection token sequence, so RGBOnly never consumes the
    # embed-space projection
    bad = [m for m in missing if not any(
        a in m for a in ("logit_scale", "attn_mask", "visual.proj"))]
    assert not bad, bad[:8]
    sd1 = ref.state_dict()
    for k, v in inv.items():
        np.testing.assert_array_equal(np.asarray(v), sd1[k].numpy(),
                                      err_msg=k)

    rng = np.random.default_rng(3)
    sample = _torchify({
        "rgb": rng.standard_normal((2, 3, img, img)).astype(np.float32),
        "instruction": rng.integers(0, vocab, (2, ctx_len)).astype(np.int32),
        "mask": (rng.random((2, 1, img, img)) > 0.4).astype(np.float32),
    })
    with torch.no_grad():
        o1, o2 = ref(sample), ref2(sample)
    for h in ("pick", "place"):
        np.testing.assert_array_equal(o2[f"{h}_heatmap"].numpy(),
                                      o1[f"{h}_heatmap"].numpy())


def test_text_unet_inverse_conversion_roundtrip(tmp_path, monkeypatch):
    """Inverse conversion for the text_unet family, incl. BatchNorm running
    stats and the ConvTranspose tap re-flip."""
    import bifold.models.clip as refclip
    import bifold.models.text_unet as ref_unet_mod
    from bifold.models.clip.model import CLIP
    from bifold.models.text_unet import TextConditionedUNet as RefUNet

    from bifold_tpu.models.convert import (convert_text_unet,
                                           convert_text_unet_inverse)

    img, width, ctx_len, vocab = 32, 64, 77, 512
    torch.manual_seed(0)
    tiny_clip = CLIP(64, img, 2, width, 16, ctx_len, vocab, width, 4, 2).float()
    sd0 = {k: v.clone() for k, v in tiny_clip.state_dict().items()}
    monkeypatch.setitem(refclip._MODELS, "Tiny-Test", "local://tiny")
    monkeypatch.setattr(
        ref_unet_mod, "load",
        lambda name, device="cpu", **kw: (refclip.build_model(dict(sd0)).float(), None))

    def make(seed):
        torch.manual_seed(seed)
        return RefUNet(text_encoder="Tiny-Test", features=[8, 16, 32],
                       image_size=img, is_bimanual=True, device="cpu")

    rng = np.random.default_rng(5)
    ref, ref2 = make(1), make(77)
    # move ref's BN stats off init so the round-trip carries REAL statistics
    ref.train()
    with torch.no_grad():
        for _ in range(3):
            ref({"depth": torch.tensor(
                     rng.standard_normal((2, 1, img, img)).astype(np.float32)),
                 "instruction": torch.tensor(
                     rng.integers(0, vocab, (2, ctx_len))).long()})
    ref.eval()

    params, stats = convert_text_unet(ref.state_dict())
    inv = convert_text_unet_inverse(params, stats)
    missing, unexpected = ref2.load_state_dict(
        {k: torch.tensor(np.ascontiguousarray(v)) for k, v in inv.items()},
        strict=False)
    assert not unexpected, unexpected[:5]
    # allowed-missing: BN step counters, the CLIP visual tower (RN50, never
    # consumed by this model), logit_scale, fused-attention buffers
    bad = [m for m in missing if not any(
        a in m for a in ("num_batches_tracked", "clip_encoder.visual.",
                         "logit_scale", "attn_mask", "text_projection"))]
    assert not bad, bad[:8]
    sd1 = ref.state_dict()
    for k, v in inv.items():
        np.testing.assert_array_equal(np.asarray(v), sd1[k].numpy(),
                                      err_msg=k)

    sample = _torchify({
        "depth": rng.standard_normal((2, 1, img, img)).astype(np.float32),
        "instruction": rng.integers(0, vocab, (2, ctx_len)).astype(np.int32),
    })
    ref2.eval()  # BN must read the restored running stats, not batch stats
    with torch.no_grad():
        o1, o2 = ref(sample), ref2(sample)
    for h in ("left_pick", "right_pick", "left_place", "right_place"):
        np.testing.assert_array_equal(o2[f"{h}_heatmap"].numpy(),
                                      o1[f"{h}_heatmap"].numpy())

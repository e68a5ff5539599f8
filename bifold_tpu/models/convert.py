"""Pretrained checkpoint conversion: HF/OpenAI torch state dicts -> our params.

The reference downloads pretrained towers at runtime (HF ``AutoModel`` for
SigLIP, the OpenAI CLIP URL table — reference siglip.py:27,
models/clip/__init__.py:34). This environment has no egress, so conversion is
an explicit offline step: given a local checkpoint (``pytorch_model.bin`` /
``*.safetensors`` / OpenAI ``.pt``), map its tensors onto the Flax parameter
tree (transpose Linear kernels, reshape conv kernels, split fused in_proj),
graft into a model's params, and save. Supports:

- SigLIP (HF ``SiglipModel`` naming) -> ``siglip_model`` subtree, with or
  without LoRA-wrapped q/v (base kernels land under ``.../q_proj/base``);
- CLIP in both HF (``CLIPModel``) and OpenAI (``visual.conv1...``) naming ->
  ``clip_encoder`` subtree;
- FULL reference-model checkpoints (``convert_bifold``) for every family:
  SigLip / SiglipSequential AND RGBOnly (rgb_clip); ``convert_text_unet``
  for TextConditionedUNet incl. its BatchNorm running stats. Each is
  parity-tested end-to-end against the reference's own torch code
  (tests/test_reference_parity.py).

CLI: python -m bifold_tpu.models.convert --checkpoint <path> \
    --arch siglip --out params.ckpt
Numerics are validated against the torch implementations in
tests/test_convert.py (BASELINE.md fidelity gate: <= 1e-2; achieved ~1e-5).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np

__all__ = ["convert_siglip", "convert_clip", "convert_bifold",
           "convert_bifold_inverse", "convert_text_unet",
           "convert_text_unet_inverse", "convert_t5", "convert_t5_inverse",
           "load_state_dict", "graft"]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _linear(sd: Dict, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[prefix + ".weight"]).T}
    if bias and prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _ln(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[prefix + ".weight"]),
            "bias": _np(sd[prefix + ".bias"])}


def _wrap_lora(dense: Dict[str, np.ndarray], lora: bool, rank: int,
               in_dim: int, out_dim: int) -> Dict:
    """Base kernel under LoRADense layout with zero adapters (peft semantics:
    B = 0, adapter starts as a no-op — siglip.py:33-40)."""
    if not lora:
        return dense
    return {"base": dense,
            "lora_a": np.zeros((in_dim, rank), np.float32),
            "lora_b": np.zeros((rank, out_dim), np.float32)}


def _stack_blocks(blocks: list, scan_layers: bool) -> Dict:
    """Per-layer param dicts -> encoder subtree. With ``scan_layers`` (the
    Transformer default) layers stack along a leading depth axis under
    ``blocks/block``; otherwise they unroll as ``block_i``."""
    # Transformer only uses the scan-stacked naming when depth > 1
    # (layers.py `if self.scan_layers and self.depth > 1`); a depth-1
    # conversion must emit block_0 or graft() has no /blocks to land on.
    if not scan_layers or len(blocks) == 1:
        return {f"block_{i}": b for i, b in enumerate(blocks)}
    import jax
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *blocks)
    return {"blocks": {"block": stacked}}


def convert_siglip(sd: Dict, *, layers: int = 12, lora: bool = False,
                   lora_rank: int = 8, scan_layers: bool = True,
                   lora_targets=("q_proj", "v_proj"),
                   lora_values=None) -> Dict:
    """HF SiglipModel state dict -> the ``siglip_model`` params subtree.

    ``lora_values``: optional ``(A, B)`` dicts keyed by the projection path
    (e.g. ``vision_model.encoder.layers.0.self_attn.q_proj``) holding trained
    peft ``lora_A``/``lora_B`` weights — used when converting a fine-tuned
    reference checkpoint rather than a raw pretrained tower.
    """
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    out: Dict[str, Any] = {"vision_model": {}, "text_model": {}}

    vm = out["vision_model"]
    patch_w = _np(sd["vision_model.embeddings.patch_embedding.weight"])
    vm["patch_embedding"] = {
        "kernel": patch_w.transpose(2, 3, 1, 0),
        "bias": _np(sd["vision_model.embeddings.patch_embedding.bias"]),
    }
    vm["position_embedding"] = _np(
        sd["vision_model.embeddings.position_embedding.weight"])
    vm["post_layernorm"] = _ln(sd, "vision_model.post_layernorm")

    tm = out["text_model"]
    tm["token_embedding"] = {
        "embedding": _np(sd["text_model.embeddings.token_embedding.weight"])}
    tm["position_embedding"] = _np(
        sd["text_model.embeddings.position_embedding.weight"])
    tm["final_layer_norm"] = _ln(sd, "text_model.final_layer_norm")

    for tower, dst in (("vision_model", vm), ("text_model", tm)):
        blocks = []
        for i in range(layers):
            p = f"{tower}.encoder.layers.{i}"
            attn = {}
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                dense = _linear(sd, f"{p}.self_attn.{proj}")
                if proj in ("q_proj", "k_proj", "v_proj") and proj in lora_targets:
                    d_in, d_out = dense["kernel"].shape
                    dense = _wrap_lora(dense, lora, lora_rank, d_in, d_out)
                    key = f"{p}.self_attn.{proj}"
                    if lora and lora_values and key in lora_values[0]:
                        dense["lora_a"] = _np(lora_values[0][key]).T  # (in, r)
                        dense["lora_b"] = _np(lora_values[1][key]).T  # (r, out)
                attn[proj] = dense
            blocks.append({
                "norm1": _ln(sd, f"{p}.layer_norm1"),
                "norm2": _ln(sd, f"{p}.layer_norm2"),
                "attn": attn,
                "mlp": {"fc1": _linear(sd, f"{p}.mlp.fc1"),
                        "fc2": _linear(sd, f"{p}.mlp.fc2")},
            })
        dst["encoder"] = _stack_blocks(blocks, scan_layers)
    return out


def _convert_clip_openai(sd: Dict, vision_layers: int, text_layers: int,
                         scan_layers: bool = True) -> Dict:
    """OpenAI-naming CLIP (the reference's vendored fork) -> ``clip_encoder``."""
    out: Dict[str, Any] = {"visual": {}, "text": {}}

    vis = out["visual"]
    conv_w = _np(sd["visual.conv1.weight"])
    vis["conv1"] = {"kernel": conv_w.transpose(2, 3, 1, 0)}
    vis["class_embedding"] = _np(sd["visual.class_embedding"])
    vis["positional_embedding"] = _np(sd["visual.positional_embedding"])
    vis["ln_pre"] = _ln(sd, "visual.ln_pre")
    vis["ln_post"] = _ln(sd, "visual.ln_post")

    txt = out["text"]
    txt["token_embedding"] = {"embedding": _np(sd["token_embedding.weight"])}
    txt["positional_embedding"] = _np(sd["positional_embedding"])
    txt["ln_final"] = _ln(sd, "ln_final")
    txt["text_projection"] = _np(sd["text_projection"])

    def blocks(prefix: str, n: int) -> Dict:
        out_blocks = []
        for i in range(n):
            p = f"{prefix}.resblocks.{i}"
            w = _np(sd[f"{p}.attn.in_proj_weight"])  # (3D, D)
            b = _np(sd[f"{p}.attn.in_proj_bias"])
            d = w.shape[0] // 3
            attn = {}
            for j, proj in enumerate(("q_proj", "k_proj", "v_proj")):
                attn[proj] = {"kernel": w[j * d:(j + 1) * d].T,
                              "bias": b[j * d:(j + 1) * d]}
            attn["out_proj"] = _linear(sd, f"{p}.attn.out_proj")
            out_blocks.append({
                "norm1": _ln(sd, f"{p}.ln_1"),
                "norm2": _ln(sd, f"{p}.ln_2"),
                "attn": attn,
                "mlp": {"fc1": _linear(sd, f"{p}.mlp.c_fc"),
                        "fc2": _linear(sd, f"{p}.mlp.c_proj")},
            })
        return _stack_blocks(out_blocks, scan_layers)

    vis["transformer"] = blocks("visual.transformer", vision_layers)
    txt["transformer"] = blocks("transformer", text_layers)
    return out


def _convert_clip_hf(sd: Dict, vision_layers: int, text_layers: int,
                     scan_layers: bool = True) -> Dict:
    """HF CLIPModel naming -> ``clip_encoder`` subtree."""
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    out: Dict[str, Any] = {"visual": {}, "text": {}}

    vis = out["visual"]
    conv_w = _np(sd["vision_model.embeddings.patch_embedding.weight"])
    vis["conv1"] = {"kernel": conv_w.transpose(2, 3, 1, 0)}
    vis["class_embedding"] = _np(sd["vision_model.embeddings.class_embedding"])
    vis["positional_embedding"] = _np(
        sd["vision_model.embeddings.position_embedding.weight"])
    vis["ln_pre"] = _ln(sd, "vision_model.pre_layrnorm")  # HF's typo'd name
    vis["ln_post"] = _ln(sd, "vision_model.post_layernorm")

    txt = out["text"]
    txt["token_embedding"] = {
        "embedding": _np(sd["text_model.embeddings.token_embedding.weight"])}
    txt["positional_embedding"] = _np(
        sd["text_model.embeddings.position_embedding.weight"])
    txt["ln_final"] = _ln(sd, "text_model.final_layer_norm")
    txt["text_projection"] = _np(sd["text_projection.weight"]).T

    def blocks(tower: str, n: int) -> Dict:
        out_blocks = []
        for i in range(n):
            p = f"{tower}.encoder.layers.{i}"
            out_blocks.append({
                "norm1": _ln(sd, f"{p}.layer_norm1"),
                "norm2": _ln(sd, f"{p}.layer_norm2"),
                "attn": {proj: _linear(sd, f"{p}.self_attn.{proj}")
                         for proj in ("q_proj", "k_proj", "v_proj", "out_proj")},
                "mlp": {"fc1": _linear(sd, f"{p}.mlp.fc1"),
                        "fc2": _linear(sd, f"{p}.mlp.fc2")},
            })
        return _stack_blocks(out_blocks, scan_layers)

    vis["transformer"] = blocks("vision_model", vision_layers)
    txt["transformer"] = blocks("text_model", text_layers)
    return out


def convert_clip(sd: Dict, *, vision_layers: int = 12,
                 text_layers: int = 12, scan_layers: bool = True) -> Dict:
    if any(k.startswith("visual.conv1") for k in sd):
        return _convert_clip_openai(sd, vision_layers, text_layers, scan_layers)
    return _convert_clip_hf(sd, vision_layers, text_layers, scan_layers)


def _max_index(keys, pattern: str) -> int:
    """Highest ``N`` in keys matching ``...{pattern}N...`` + 1 (0 if none)."""
    import re

    rx = re.compile(pattern + r"(\d+)")
    hits = [int(m.group(1)) for k in keys for m in [rx.search(k)] if m]
    return max(hits) + 1 if hits else 0


def _conv2d(sd: Dict, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    """torch Conv2d (out, in, kh, kw) -> flax HWIO kernel."""
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _bn(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _bn_stats(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"mean": _np(sd[f"{prefix}.running_mean"]),
            "var": _np(sd[f"{prefix}.running_var"])}


def convert_t5(sd: Dict) -> Dict:
    """HF ``T5EncoderModel`` state dict -> params for our
    :class:`~bifold_tpu.models.backbones.T5Encoder` (the non-CLIP branch of
    TextConditionedUNet, reference text_unet.py:56-59).

    Accepts a raw state dict or a local HF checkpoint directory path via
    :func:`load_state_dict`. Handles both FFN variants (``wi`` for relu,
    ``wi_0``/``wi_1`` for gated-gelu). The relative-position bias table
    lives in block 0 (HF ``has_relative_attention_bias = (i == 0)``) and is
    shared by every layer — ours stores it once at the encoder level.
    """
    out: Dict[str, Any] = {
        "shared": {"embedding": _np(sd["shared.weight"]
                                    if "shared.weight" in sd
                                    else sd["encoder.embed_tokens.weight"])},
        "relative_attention_bias": {"embedding": _np(
            sd["encoder.block.0.layer.0.SelfAttention"
               ".relative_attention_bias.weight"])},
        "final_layer_norm": {"scale": _np(sd["encoder.final_layer_norm"
                                             ".weight"])},
    }
    n = _max_index(sd, r"^encoder\.block\.")
    for i in range(n):
        p = f"encoder.block.{i}."
        out[f"block_{i}_ln_attn"] = {
            "scale": _np(sd[p + "layer.0.layer_norm.weight"])}
        for m in "qkvo":
            out[f"block_{i}_{m}"] = {
                "kernel": _np(sd[p + f"layer.0.SelfAttention.{m}.weight"]).T}
        out[f"block_{i}_ln_ffn"] = {
            "scale": _np(sd[p + "layer.1.layer_norm.weight"])}
        ff = p + "layer.1.DenseReluDense."
        if ff + "wi.weight" in sd:
            out[f"block_{i}_wi"] = {"kernel": _np(sd[ff + "wi.weight"]).T}
        else:
            out[f"block_{i}_wi_0"] = {"kernel": _np(sd[ff + "wi_0.weight"]).T}
            out[f"block_{i}_wi_1"] = {"kernel": _np(sd[ff + "wi_1.weight"]).T}
        out[f"block_{i}_wo"] = {"kernel": _np(sd[ff + "wo.weight"]).T}
    return out


def convert_t5_inverse(params: Dict) -> Dict:
    """Our T5Encoder params -> HF T5EncoderModel state-dict naming (inverse
    of :func:`convert_t5`). ``encoder.embed_tokens.weight`` is emitted as
    well (HF ties it to ``shared.weight``)."""
    out: Dict[str, Any] = {}
    emb = np.asarray(params["shared"]["embedding"])
    out["shared.weight"] = emb
    out["encoder.embed_tokens.weight"] = emb
    out["encoder.block.0.layer.0.SelfAttention"
        ".relative_attention_bias.weight"] = \
        np.asarray(params["relative_attention_bias"]["embedding"])
    out["encoder.final_layer_norm.weight"] = \
        np.asarray(params["final_layer_norm"]["scale"])
    i = 0
    while f"block_{i}_q" in params:
        p = f"encoder.block.{i}."
        out[p + "layer.0.layer_norm.weight"] = \
            np.asarray(params[f"block_{i}_ln_attn"]["scale"])
        for m in "qkvo":
            out[p + f"layer.0.SelfAttention.{m}.weight"] = \
                np.asarray(params[f"block_{i}_{m}"]["kernel"]).T
        out[p + "layer.1.layer_norm.weight"] = \
            np.asarray(params[f"block_{i}_ln_ffn"]["scale"])
        ff = p + "layer.1.DenseReluDense."
        if f"block_{i}_wi" in params:
            out[ff + "wi.weight"] = \
                np.asarray(params[f"block_{i}_wi"]["kernel"]).T
        else:
            out[ff + "wi_0.weight"] = \
                np.asarray(params[f"block_{i}_wi_0"]["kernel"]).T
            out[ff + "wi_1.weight"] = \
                np.asarray(params[f"block_{i}_wi_1"]["kernel"]).T
        out[ff + "wo.weight"] = \
            np.asarray(params[f"block_{i}_wo"]["kernel"]).T
        i += 1
    return out


def convert_text_unet(sd: Dict, *, scan_layers: bool = True
                      ) -> Tuple[Dict, Dict]:
    """Reference TextConditionedUNet state dict (text_unet.py:47-140) ->
    (params, batch_stats) for our ``text_unet``.

    Covers the CLIP-text conditioning tower (text side only — the visual
    tower, ResNet for RN50, is never used by this model), the double-conv
    encoder blocks, the FiLM decoder blocks (ConvTranspose + convs + BN +
    FiLM), and the 1x1 head convs. BatchNorm running stats return as a
    separate ``batch_stats`` collection tree.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    clip_sd = {k.removeprefix("clip_encoder."): v for k, v in sd.items()
               if k.startswith("clip_encoder.")}
    if clip_sd:
        t_layers = _max_index(
            [k for k in clip_sd if k.startswith("transformer.")],
            r"resblocks\.")
        full = _convert_clip_openai_text(clip_sd, t_layers, scan_layers)
        params["clip_encoder"] = full
    t5_sd = {k.removeprefix("text_encoder."): v for k, v in sd.items()
             if k.startswith("text_encoder.")}
    if t5_sd:  # the T5 branch (text_unet.py:56-59)
        params["text_encoder"] = convert_t5(t5_sd)

    n_enc = _max_index(sd, r"^encoder\.")
    for i in range(n_enc):
        for j, (conv_slot, bn_slot) in enumerate(((0, 1), (3, 4))):
            params[f"enc{i}_conv{j}"] = _conv2d(
                sd, f"encoder.{i}.{conv_slot}", bias=False)
            params[f"enc{i}_bn{j}"] = _bn(sd, f"encoder.{i}.{bn_slot}")
            stats[f"enc{i}_bn{j}"] = _bn_stats(sd, f"encoder.{i}.{bn_slot}")

    n_dec = _max_index(sd, r"^decoder\.")
    for i in range(n_dec):
        p = f"decoder.{i}"
        # torch ConvTranspose2d weight (in, out, kh, kw); flax ConvTranspose
        # (transpose_kernel=False) wants (kh, kw, in, out) with the SPATIAL
        # TAPS FLIPPED relative to torch's gradient-of-conv semantics
        w = _np(sd[f"{p}.convt.weight"]).transpose(2, 3, 0, 1)[::-1, ::-1]
        blk = {
            "convt": {"kernel": np.ascontiguousarray(w),
                      "bias": _np(sd[f"{p}.convt.bias"])},
            "conv1": _conv2d(sd, f"{p}.conv1"),
            "bn1": _bn(sd, f"{p}.bn1"),
            "conv2": _conv2d(sd, f"{p}.conv2"),
            "bn2": _bn(sd, f"{p}.bn2"),
            "film_conv": _conv2d(sd, f"{p}.film.conv"),
            "film_gamma": _linear(sd, f"{p}.film.gamma"),
            "film_beta": _linear(sd, f"{p}.film.beta"),
        }
        params[f"dec{i}"] = blk
        stats[f"dec{i}"] = {"bn1": _bn_stats(sd, f"{p}.bn1"),
                            "bn2": _bn_stats(sd, f"{p}.bn2")}

    for head in ("pick_decoder", "place_decoder", "left_pick_decoder",
                 "right_pick_decoder", "left_place_decoder",
                 "right_place_decoder"):
        k0 = f"{head}.weight"
        if k0 in sd:
            w = _np(sd[k0])  # (1, f, 1, 1) 1x1 conv -> Dense (f, 1)
            params[head] = {"kernel": w[:, :, 0, 0].T,
                            "bias": _np(sd[f"{head}.bias"])}
    return params, stats


def _convert_clip_openai_text(sd: Dict, text_layers: int,
                              scan_layers: bool = True) -> Dict:
    """Text side only of the OpenAI-naming converter (for models whose
    visual tower is absent or non-ViT, e.g. text_unet's RN50)."""
    full_sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}
    out: Dict[str, Any] = {"text": {}}
    txt = out["text"]
    txt["token_embedding"] = {"embedding": _np(full_sd["token_embedding.weight"])}
    txt["positional_embedding"] = _np(full_sd["positional_embedding"])
    txt["ln_final"] = _ln(full_sd, "ln_final")
    if "text_projection" in full_sd:
        txt["text_projection"] = _np(full_sd["text_projection"])
    blocks = []
    for i in range(text_layers):
        p = f"transformer.resblocks.{i}"
        w = _np(full_sd[f"{p}.attn.in_proj_weight"])
        b = _np(full_sd[f"{p}.attn.in_proj_bias"])
        d = w.shape[0] // 3
        attn = {}
        for j, proj in enumerate(("q_proj", "k_proj", "v_proj")):
            attn[proj] = {"kernel": w[j * d:(j + 1) * d].T,
                          "bias": b[j * d:(j + 1) * d]}
        attn["out_proj"] = _linear(full_sd, f"{p}.attn.out_proj")
        blocks.append({
            "norm1": _ln(full_sd, f"{p}.ln_1"),
            "norm2": _ln(full_sd, f"{p}.ln_2"),
            "attn": attn,
            "mlp": {"fc1": _linear(full_sd, f"{p}.mlp.c_fc"),
                    "fc2": _linear(full_sd, f"{p}.mlp.c_proj")},
        })
    txt["transformer"] = _stack_blocks(blocks, scan_layers)
    return out


def convert_bifold(sd: Dict, *, scan_layers: bool = True) -> Dict:
    """Full reference-model state dict -> our full params tree.

    Handles the complete SigLip / SiglipSequential graph of
    /root/reference/bifold/models/siglip.py — the (optionally peft-LoRA-
    wrapped) SigLIP towers, learned text/image modality tokens, context
    position embeddings — AND the RGBOnly graph of rgb_clip.py:9-80 (the
    frozen vendored-CLIP encoder, vision->text projection, learned rgb/text
    position embeddings), plus the shared ConcatTransformer fusion
    (fusion.py:8-64 / transformer.py) and per-head ConvDecoders
    (modules.py:33-74, pickplace.py:10-124). Layer counts, LoRA presence and
    rank, bimanual-ness and mask head are all inferred from the keys, so the
    same call ingests the reference's published fine-tuned ``.pth``
    checkpoints as well as freshly-initialized models.
    """
    sd = {k: v for k, v in sd.items()}
    out: Dict[str, Any] = {}

    # ---- SigLIP towers (strip the peft LoraModel wrapper if present) ----
    tower_sd, lora_a, lora_b = {}, {}, {}
    for k, v in sd.items():
        if not k.startswith("siglip_model."):
            continue
        k = k.removeprefix("siglip_model.").removeprefix("model.")
        if ".lora_A." in k:            # ...q_proj.lora_A.<adapter>.weight
            lora_a[k.split(".lora_A.")[0]] = v
        elif ".lora_B." in k:
            lora_b[k.split(".lora_B.")[0]] = v
        else:
            tower_sd[k.replace(".base_layer.", ".")] = v
    if tower_sd:
        layers = _max_index(tower_sd, r"vision_model\.encoder\.layers\.")
        lora = bool(lora_a)
        rank = _np(next(iter(lora_a.values()))).shape[0] if lora else 8
        out["siglip_model"] = convert_siglip(
            tower_sd, layers=layers, lora=lora, lora_rank=rank,
            scan_layers=scan_layers, lora_values=(lora_a, lora_b))

    # ---- rgb_clip (reference rgb_clip.py:9-80): frozen vendored-CLIP
    # encoder + vision->text projection + learned position embeddings ----
    clip_sd = {k.removeprefix("clip_encoder."): v for k, v in sd.items()
               if k.startswith("clip_encoder.")}
    if clip_sd:
        v_layers = _max_index(
            [k for k in clip_sd if k.startswith("visual.")], r"resblocks\.")
        t_layers = _max_index(
            [k for k in clip_sd if k.startswith("transformer.")],
            r"resblocks\.")
        out["clip_encoder"] = convert_clip(
            clip_sd, vision_layers=v_layers, text_layers=t_layers,
            scan_layers=scan_layers)
    if "project.weight" in sd:
        out["project"] = _linear(sd, "project")

    # ---- modality tokens + learned position embeddings ----
    for name in ("text_token", "image_token", "context_pos_embedding",
                 "rgb_pos_embedding", "text_pos_embedding"):
        if name in sd:
            out[name] = _np(sd[name])

    # ---- fusion: token-type embeddings + pre-norm transformer ----
    pp: Dict[str, Any] = {}
    if "pick_place.fusion.token_type_embeddings.weight" in sd:
        fusion: Dict[str, Any] = {
            "token_type_embeddings": {
                "embedding": _np(sd["pick_place.fusion.token_type_embeddings.weight"])}
        }
        depth = _max_index(sd, r"pick_place\.fusion\.transformer_encoder\.layers\.")
        blocks = []
        for i in range(depth):
            p = f"pick_place.fusion.transformer_encoder.layers.{i}"
            # reference layer = [PreNorm(Attention), PreNorm(FeedForward)]
            # (transformer.py:45-58); to_out is Sequential(Linear, Dropout)
            blocks.append({
                "norm1": _ln(sd, f"{p}.0.norm"),
                "attn": {
                    "to_qkv": {"kernel": _np(sd[f"{p}.0.fn.to_qkv.weight"]).T},
                    "out_proj": _linear(sd, f"{p}.0.fn.to_out.0"),
                },
                "norm2": _ln(sd, f"{p}.1.norm"),
                "mlp": {"fc1": _linear(sd, f"{p}.1.fn.net.0"),
                        "fc2": _linear(sd, f"{p}.1.fn.net.3")},
            })
        fusion["transformer_encoder"] = _stack_blocks(blocks, scan_layers)
        if "pick_place.fusion.registers" in sd:
            fusion["registers"] = _np(sd["pick_place.fusion.registers"])
        pp["fusion"] = fusion

    # ---- ConvDecoder heads: 1x1 convs at Sequential slots 0,2,4,6,8 ----
    heads = ("pick_decoder", "place_decoder", "left_pick_decoder",
             "right_pick_decoder", "left_place_decoder", "right_place_decoder",
             "mask_head")
    for head in heads:
        k0 = f"pick_place.{head}.decoder_net.0.weight"
        if k0 not in sd:
            continue
        dec = {}
        for j, slot in enumerate((0, 2, 4, 6, 8)):
            w = _np(sd[f"pick_place.{head}.decoder_net.{slot}.weight"])
            dec[f"conv{j}"] = {
                "kernel": w[:, :, 0, 0].T,  # (out,in,1,1) -> (in,out)
                "bias": _np(sd[f"pick_place.{head}.decoder_net.{slot}.bias"]),
            }
        pp[head] = dec
    if pp:
        out["pick_place"] = pp
    return out


def _unstack_blocks(enc: Dict) -> list:
    """Inverse of :func:`_stack_blocks`: encoder subtree -> per-layer dicts."""
    import jax

    if "blocks" in enc:
        stacked = enc["blocks"]["block"]
        leaves, treedef = jax.tree_util.tree_flatten(stacked)
        depth = int(np.shape(leaves[0])[0])
        return [jax.tree_util.tree_unflatten(
            treedef, [np.asarray(l)[i] for l in leaves])
            for i in range(depth)]
    keys = sorted((k for k in enc if k.startswith("block_")),
                  key=lambda s: int(s.split("_")[1]))
    return [enc[k] for k in keys]


def _inv_linear(out: Dict, prefix: str, dense: Dict) -> None:
    out[prefix + ".weight"] = np.asarray(dense["kernel"]).T
    if "bias" in dense:
        out[prefix + ".bias"] = np.asarray(dense["bias"])


def _inv_ln(out: Dict, prefix: str, ln: Dict) -> None:
    out[prefix + ".weight"] = np.asarray(ln["scale"])
    out[prefix + ".bias"] = np.asarray(ln["bias"])


def _inv_clip_blocks(out: Dict, prefix: str, enc: Dict) -> None:
    """Inverse of the OpenAI-naming block converter: q/k/v re-concatenate
    into MultiheadAttention's fused in_proj."""
    for i, blk in enumerate(_unstack_blocks(enc)):
        p = f"{prefix}.resblocks.{i}"
        _inv_ln(out, f"{p}.ln_1", blk["norm1"])
        _inv_ln(out, f"{p}.ln_2", blk["norm2"])
        a = blk["attn"]
        out[f"{p}.attn.in_proj_weight"] = np.concatenate(
            [np.asarray(a[pr]["kernel"]).T
             for pr in ("q_proj", "k_proj", "v_proj")], axis=0)
        out[f"{p}.attn.in_proj_bias"] = np.concatenate(
            [np.asarray(a[pr]["bias"])
             for pr in ("q_proj", "k_proj", "v_proj")], axis=0)
        _inv_linear(out, f"{p}.attn.out_proj", a["out_proj"])
        _inv_linear(out, f"{p}.mlp.c_fc", blk["mlp"]["fc1"])
        _inv_linear(out, f"{p}.mlp.c_proj", blk["mlp"]["fc2"])


def _inv_clip_text(out: Dict, root: str, txt: Dict) -> None:
    out[root + "token_embedding.weight"] = \
        np.asarray(txt["token_embedding"]["embedding"])
    out[root + "positional_embedding"] = \
        np.asarray(txt["positional_embedding"])
    _inv_ln(out, root + "ln_final", txt["ln_final"])
    if "text_projection" in txt:
        out[root + "text_projection"] = np.asarray(txt["text_projection"])
    _inv_clip_blocks(out, root + "transformer", txt["transformer"])


def _inv_clip_openai(out: Dict, root: str, tree: Dict) -> None:
    """``clip_encoder`` subtree -> the vendored fork's OpenAI naming
    (inverse of :func:`_convert_clip_openai`)."""
    vis = tree["visual"]
    out[root + "visual.conv1.weight"] = \
        np.asarray(vis["conv1"]["kernel"]).transpose(3, 2, 0, 1)
    out[root + "visual.class_embedding"] = np.asarray(vis["class_embedding"])
    out[root + "visual.positional_embedding"] = \
        np.asarray(vis["positional_embedding"])
    _inv_ln(out, root + "visual.ln_pre", vis["ln_pre"])
    _inv_ln(out, root + "visual.ln_post", vis["ln_post"])
    _inv_clip_blocks(out, root + "visual.transformer", vis["transformer"])
    _inv_clip_text(out, root, tree["text"])


def convert_bifold_inverse(params: Dict, *,
                           adapter: str = "siglip_adapter") -> Dict:
    """Our SigLip / SiglipSequential / RGBOnly params tree -> the reference
    model's torch state-dict naming (the inverse of :func:`convert_bifold`)
    — so a model trained HERE deploys back into the reference's own tooling
    (`model.load_state_dict`, its evaluators, its published-checkpoint
    format). TextConditionedUNet has its own inverse
    (:func:`convert_text_unet_inverse` — it also carries BatchNorm stats).

    Emits every key the reference *forward* consumes: the SigLIP towers
    (peft naming — ``base_layer`` / ``lora_A.<adapter>`` — when the params
    carry LoRA wraps; the reference's adapter is named "siglip_adapter",
    siglip.py:40), modality tokens, context position embeddings, the fusion
    transformer (transformer.py layer = [PreNorm(Attention),
    PreNorm(FeedForward)]), and the ConvDecoder heads at Sequential slots
    0,2,4,6,8. NOT emitted (absent from our tree because the bifold forward
    never reads them): the HF pooling heads, ``logit_scale``/``logit_bias``,
    and ``position_ids`` buffers — load with ``strict=False`` and check the
    missing set (tests/test_reference_parity.py round-trips this bitwise).
    """
    params = dict(params)
    if any(k.startswith("enc0_") for k in params):
        raise NotImplementedError(
            "TextConditionedUNet params carry BatchNorm statistics; use "
            "convert_text_unet_inverse(params, batch_stats)")
    out: Dict[str, Any] = {}
    if "clip_encoder" in params:   # rgb_clip family (RGBOnly)
        _inv_clip_openai(out, "clip_encoder.", params["clip_encoder"])

    sig = params.get("siglip_model")
    if sig is not None:
        lora = any("base" in blk["attn"][p]
                   for blk in _unstack_blocks(sig["vision_model"]["encoder"])
                   for p in ("q_proj", "v_proj"))
        root = "siglip_model.model." if lora else "siglip_model."

        vm = sig["vision_model"]
        pk = np.asarray(vm["patch_embedding"]["kernel"])  # (H, W, in, out)
        out[root + "vision_model.embeddings.patch_embedding.weight"] = \
            pk.transpose(3, 2, 0, 1)
        out[root + "vision_model.embeddings.patch_embedding.bias"] = \
            np.asarray(vm["patch_embedding"]["bias"])
        out[root + "vision_model.embeddings.position_embedding.weight"] = \
            np.asarray(vm["position_embedding"])
        _inv_ln(out, root + "vision_model.post_layernorm",
                vm["post_layernorm"])

        tm = sig["text_model"]
        out[root + "text_model.embeddings.token_embedding.weight"] = \
            np.asarray(tm["token_embedding"]["embedding"])
        out[root + "text_model.embeddings.position_embedding.weight"] = \
            np.asarray(tm["position_embedding"])
        _inv_ln(out, root + "text_model.final_layer_norm",
                tm["final_layer_norm"])

        for tower, src in (("vision_model", vm), ("text_model", tm)):
            for i, blk in enumerate(_unstack_blocks(src["encoder"])):
                p = f"{root}{tower}.encoder.layers.{i}"
                _inv_ln(out, f"{p}.layer_norm1", blk["norm1"])
                _inv_ln(out, f"{p}.layer_norm2", blk["norm2"])
                for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                    d = blk["attn"][proj]
                    kp = f"{p}.self_attn.{proj}"
                    if "base" in d:       # LoRADense layout (peft semantics)
                        _inv_linear(out, kp + ".base_layer", d["base"])
                        out[f"{kp}.lora_A.{adapter}.weight"] = \
                            np.asarray(d["lora_a"]).T
                        out[f"{kp}.lora_B.{adapter}.weight"] = \
                            np.asarray(d["lora_b"]).T
                    else:
                        _inv_linear(out, kp, d)
                _inv_linear(out, f"{p}.mlp.fc1", blk["mlp"]["fc1"])
                _inv_linear(out, f"{p}.mlp.fc2", blk["mlp"]["fc2"])

    for name in ("text_token", "image_token", "context_pos_embedding",
                 "rgb_pos_embedding", "text_pos_embedding"):
        if name in params:
            out[name] = np.asarray(params[name])
    if "project" in params:
        _inv_linear(out, "project", params["project"])

    pp = params.get("pick_place") or {}
    if "fusion" in pp:
        fusion = pp["fusion"]
        out["pick_place.fusion.token_type_embeddings.weight"] = \
            np.asarray(fusion["token_type_embeddings"]["embedding"])
        if "registers" in fusion:
            out["pick_place.fusion.registers"] = \
                np.asarray(fusion["registers"])
        for i, blk in enumerate(_unstack_blocks(fusion["transformer_encoder"])):
            if "fc1" not in blk.get("mlp", {}):
                raise NotImplementedError(
                    "MoE fusion FFNs (model.moe_experts) have no "
                    "reference-format equivalent; inverse conversion covers "
                    "dense-FFN checkpoints only")
            p = f"pick_place.fusion.transformer_encoder.layers.{i}"
            _inv_ln(out, f"{p}.0.norm", blk["norm1"])
            out[f"{p}.0.fn.to_qkv.weight"] = \
                np.asarray(blk["attn"]["to_qkv"]["kernel"]).T
            _inv_linear(out, f"{p}.0.fn.to_out.0", blk["attn"]["out_proj"])
            _inv_ln(out, f"{p}.1.norm", blk["norm2"])
            _inv_linear(out, f"{p}.1.fn.net.0", blk["mlp"]["fc1"])
            _inv_linear(out, f"{p}.1.fn.net.3", blk["mlp"]["fc2"])
    for head in ("pick_decoder", "place_decoder", "left_pick_decoder",
                 "right_pick_decoder", "left_place_decoder",
                 "right_place_decoder", "mask_head"):
        if head not in pp:
            continue
        for j, slot in enumerate((0, 2, 4, 6, 8)):
            conv = pp[head][f"conv{j}"]
            out[f"pick_place.{head}.decoder_net.{slot}.weight"] = \
                np.asarray(conv["kernel"]).T[:, :, None, None]
            out[f"pick_place.{head}.decoder_net.{slot}.bias"] = \
                np.asarray(conv["bias"])
    return out


def convert_text_unet_inverse(params: Dict, batch_stats: Dict) -> Dict:
    """Our ``text_unet`` (params, batch_stats) -> the reference
    TextConditionedUNet state-dict naming (inverse of
    :func:`convert_text_unet`): CLIP-text conditioning tower, double-conv
    encoder blocks, FiLM decoder blocks (ConvTranspose taps re-flipped to
    torch's gradient-of-conv layout), BatchNorm running stats, 1x1 heads.
    ``num_batches_tracked`` buffers are not emitted (our BN carries no
    step counter; they do not affect eval-mode forward) — load with
    ``strict=False``."""
    out: Dict[str, Any] = {}
    if "clip_encoder" in params:
        _inv_clip_text(out, "clip_encoder.", params["clip_encoder"]["text"])
    if "text_encoder" in params:  # T5 branch
        for k, v in convert_t5_inverse(params["text_encoder"]).items():
            out["text_encoder." + k] = v

    def inv_conv(prefix: str, conv: Dict) -> None:
        out[prefix + ".weight"] = \
            np.asarray(conv["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in conv:
            out[prefix + ".bias"] = np.asarray(conv["bias"])

    def inv_bn(prefix: str, bn: Dict, stats: Dict) -> None:
        out[prefix + ".weight"] = np.asarray(bn["scale"])
        out[prefix + ".bias"] = np.asarray(bn["bias"])
        out[prefix + ".running_mean"] = np.asarray(stats["mean"])
        out[prefix + ".running_var"] = np.asarray(stats["var"])

    i = 0
    while f"enc{i}_conv0" in params:
        for j, (conv_slot, bn_slot) in enumerate(((0, 1), (3, 4))):
            inv_conv(f"encoder.{i}.{conv_slot}", params[f"enc{i}_conv{j}"])
            inv_bn(f"encoder.{i}.{bn_slot}", params[f"enc{i}_bn{j}"],
                   batch_stats[f"enc{i}_bn{j}"])
        i += 1
    i = 0
    while f"dec{i}" in params:
        blk, bst = params[f"dec{i}"], batch_stats[f"dec{i}"]
        p = f"decoder.{i}"
        k = np.asarray(blk["convt"]["kernel"])[::-1, ::-1]  # unflip taps
        out[f"{p}.convt.weight"] = \
            np.ascontiguousarray(k.transpose(2, 3, 0, 1))
        out[f"{p}.convt.bias"] = np.asarray(blk["convt"]["bias"])
        inv_conv(f"{p}.conv1", blk["conv1"])
        inv_bn(f"{p}.bn1", blk["bn1"], bst["bn1"])
        inv_conv(f"{p}.conv2", blk["conv2"])
        inv_bn(f"{p}.bn2", blk["bn2"], bst["bn2"])
        inv_conv(f"{p}.film.conv", blk["film_conv"])
        _inv_linear(out, f"{p}.film.gamma", blk["film_gamma"])
        _inv_linear(out, f"{p}.film.beta", blk["film_beta"])
        i += 1
    for head in ("pick_decoder", "place_decoder", "left_pick_decoder",
                 "right_pick_decoder", "left_place_decoder",
                 "right_place_decoder"):
        if head in params:
            out[f"{head}.weight"] = \
                np.asarray(params[head]["kernel"]).T[:, :, None, None]
            out[f"{head}.bias"] = np.asarray(params[head]["bias"])
    return out


def load_state_dict(path: str | Path) -> Dict:
    """Load a torch checkpoint: .safetensors, .bin/.pt (pickle), or a HF
    model directory."""
    path = Path(path)
    if path.is_dir():
        # sharded HF save_pretrained layout (weights over the 2GB/shard
        # limit): an index json mapping tensor name -> shard file
        for idx_name in ("model.safetensors.index.json",
                         "pytorch_model.bin.index.json"):
            idx = path / idx_name
            if idx.exists():
                import json as _json
                weight_map = _json.loads(idx.read_text())["weight_map"]
                sd: Dict = {}
                for shard in sorted(set(weight_map.values())):
                    sd.update(load_state_dict(path / shard))
                return sd
        for name in ("model.safetensors", "pytorch_model.bin"):
            if (path / name).exists():
                path = path / name
                break
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file  # noqa: WPS433
        return load_file(str(path))
    import torch  # noqa: WPS433
    obj = torch.load(str(path), map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    # the reference Trainer's .pth wraps the weights: {"model": sd, "epoch",
    # "optimizer", ...} (reference __main__.py:304-325)
    if isinstance(obj, dict) and "model" in obj \
            and isinstance(obj["model"], dict) \
            and any("." in k for k in obj["model"]):
        obj = obj["model"]
    return obj


def graft(params: Dict, subtree_name: str, converted: Dict) -> Dict:
    """Replace ``params[subtree_name]`` leaves with converted tensors,
    asserting shape agreement (missing leaves keep their init, e.g. LoRA
    adapters when the checkpoint has none)."""
    import jax

    def merge(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"{path}/{k} not present in model params")
            if isinstance(v, dict):
                out[k] = merge(dst[k], v, f"{path}/{k}")
            else:
                expect = np.shape(dst[k])
                got = np.shape(v)
                assert expect == got, f"{path}/{k}: {got} != {expect}"
                out[k] = jax.numpy.asarray(v, dtype=dst[k].dtype)
        return out

    new = dict(params)
    new[subtree_name] = merge(params[subtree_name], converted, subtree_name)
    return new


def main() -> None:
    import argparse
    import pickle

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--arch", choices=["siglip", "clip", "bifold", "t5"],
                    help="forward direction only (--inverse infers the "
                         "family from the checkpoint tree). "
                         "siglip/clip: a pretrained tower checkpoint; "
                         "bifold: a full fine-tuned reference model .pth "
                         "(e.g. the published BiFold checkpoints) — any "
                         "family; text_unet checkpoints pickle as "
                         "{'params': ..., 'batch_stats': ...}")
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--lora", action="store_true")
    ap.add_argument("--inverse", action="store_true",
                    help="convert the OTHER way: a bifold-tpu .ckpt -> a "
                         "reference-format torch .pth (siglip family), so "
                         "models trained here deploy into the reference's "
                         "own tooling")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    if args.inverse:
        import torch  # noqa: WPS433

        from bifold_tpu.utils.checkpoint import load_checkpoint
        payload = load_checkpoint(args.checkpoint, restore_rng=False)
        params = payload["params"]
        if any(k.startswith("enc0_") for k in params):  # text_unet + BN
            sd = convert_text_unet_inverse(
                params, (payload.get("extra_vars") or {})["batch_stats"])
        else:
            sd = convert_bifold_inverse(params)
        def _torchable(v):
            # Trainer checkpoints saved with precast_frozen=true store frozen
            # towers as ml_dtypes bfloat16 numpy arrays, which torch.tensor
            # rejects. The reference's .pth files are f32; upcast any
            # non-f32/f64 float leaf (bf16/f16) to f32 at the boundary.
            v = np.ascontiguousarray(v)
            if v.dtype.kind == "V" or (v.dtype.kind == "f"
                                       and v.dtype.itemsize < 4):
                v = v.astype(np.float32)
            return torch.tensor(v)

        torch.save(
            {"model": {k: _torchable(v) for k, v in sd.items()},
             "epoch": int(payload.get("epoch", 0))}, args.out)
        print(f"[convert] wrote reference-format {args.out} "
              f"({len(sd)} tensors)")
        return
    if not args.arch:
        ap.error("--arch is required for forward conversion")
    sd = load_state_dict(args.checkpoint)
    if args.arch == "siglip":
        converted = convert_siglip(sd, layers=args.layers, lora=args.lora)
    elif args.arch == "t5":
        # standalone HF T5 encoder dir/checkpoint -> text_unet's
        # text_encoder subtree (reference text_unet.py:56-59 from_pretrained)
        converted = convert_t5(sd)
    elif args.arch == "bifold":
        if any(k.startswith("encoder.0.0") for k in sd):
            # TextConditionedUNet checkpoint: params + BN running stats
            params, stats = convert_text_unet(sd)
            converted = {"params": params, "batch_stats": stats}
        else:
            converted = convert_bifold(sd)
    else:
        converted = convert_clip(sd, vision_layers=args.layers,
                                 text_layers=args.layers)
    with open(args.out, "wb") as f:
        pickle.dump(converted, f)
    n = sum(np.asarray(x).size
            for x in __import__("jax").tree_util.tree_leaves(converted))
    print(f"[convert] wrote {args.out} ({n / 1e6:.1f}M params)")
    # carry tokenizer assets alongside the converted weights: a spiece.model
    # in the source HF checkpoint dir rides to the output dir, where
    # utils/checkpoint.load_checkpoint registers it for the from-scratch
    # sentencepiece tokenizer (exact pretrained ids offline — VERDICT r3 #1)
    src = Path(args.checkpoint)
    src_dir = src if src.is_dir() else src.parent
    spm = src_dir / "spiece.model"
    if spm.exists():
        import shutil
        dest = Path(args.out).parent / "spiece.model"
        if spm.resolve() != dest.resolve():
            shutil.copyfile(spm, dest)
        print(f"[convert] carried tokenizer asset -> {dest}")


if __name__ == "__main__":
    main()

"""The preprocessing core: raw records -> model-ready sample dicts, on device.

Counterpart of /root/reference/bifold/data/processor.py (Processor.__call__
and helpers), redesigned TPU-first: the reference runs PIL/torchvision
transforms per sample inside DataLoader worker processes; here every image
transform (bicubic resize-as-matmul, gray-77 composite, normalize, joint
spatial augmentation, Gaussian target synthesis) is one jitted, batched XLA
computation (:func:`Processor.process_batch`). Host code only decodes files,
tokenizes text, and pads labels to fixed shapes.

Output sample keys match the reference exactly: ``rgb``, ``raw_rgb``,
``depth``, ``mask``, ``instruction``, ``raw_instruction``, ``rgb_context``,
``depth_context``, ``context_attention_mask``, per-label pixel arrays
(``pick``/``place`` or ``left_pick``/...) and train-time ``<label>_heatmap``
targets; graph mode adds ``graph``, per-pick node heatmaps, and (test)
``pixel_sampled_pc``.

Deliberate parity decisions (reference quirks, documented in SURVEY.md §7):
- the reference augments every sample key containing "rgb"/"depth" but NOT
  the mask (processor.py:327-333) — we reproduce that by default
  (``augment_mask=False``) since the models were trained that way;
- the reference's raw_rgb is (H, W, 3) channel-last, so torchvision's affine
  silently warps the wrong axes; we warp raw_rgb correctly (it is only used
  for visualization);
- ``raw_rgb`` is emitted for train too (the reference's ``if True or
  partition == "test"``, processor.py:261).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bifold_tpu.data.tokenizers import build_tokenizer
from bifold_tpu.data.utils import compute_edge_attr, fps, voxelize_pointcloud
from bifold_tpu.ops import depth as depth_ops
from bifold_tpu.ops import image as image_ops
from bifold_tpu.ops.augment import spatial_augment
from bifold_tpu.ops.gaussmap import batched_gaussmap
from bifold_tpu.ops.geometry import pixel_from_world, world_coords_from_depth, world_from_pixel

__all__ = ["Processor", "DUMMY", "MAX_LABEL_POINTS"]

MAX_LABEL_POINTS = 8  # reference DUMMY = -ones(8, 2) (processor.py:23)
DUMMY = -np.ones((MAX_LABEL_POINTS, 2), dtype=np.float32)


def pad_label(val: Optional[np.ndarray]) -> np.ndarray:
    """(2,) or (k, 2) label -> fixed (8, 2) float32 padded with -1."""
    out = DUMMY.copy()
    if val is not None:
        val = np.asarray(val, np.float32).reshape(-1, 2)[:MAX_LABEL_POINTS]
        out[: len(val)] = val
    return out


@dataclasses.dataclass(frozen=True)
class _CoreSpec:
    """Hashable static configuration of the jitted pipeline."""

    image_size: int
    sigma: float
    strategy: str
    mask_depth: bool
    standardize_depth: bool
    random_depth_shift: bool
    add_depth_noise: bool
    min_shift: float
    max_shift: float
    spatial_augment: bool
    max_trials: int
    rotate_range: tuple
    translate_range: tuple
    image_mean: tuple
    image_std: tuple
    siglip_norm: bool
    augment_mask: bool
    label_keys: tuple
    train: bool
    has_rgb: bool
    has_depth: bool
    has_mask: bool
    n_context: int
    context_rgb: bool


@lru_cache(maxsize=32)
def _jitted_core(spec: _CoreSpec):
    return jax.jit(partial(_core, spec))


def _resize(x, size):
    return image_ops.resize(x, size, method="bicubic", antialias=True)


def _process_rgb(spec: _CoreSpec, rgb_u8, mask):
    """uint8 (B, H, W, 3) + optional (B, H, W) mask -> normalized (B, 3, S, S).

    Masked composite over gray 77 with uint8 truncation (processor.py:256-258),
    bicubic resize, SigLIP (0.5/0.5) or CLIP mean/std normalize.
    """
    rgb = jnp.transpose(rgb_u8, (0, 3, 1, 2))  # (B, 3, H, W)
    if mask is not None:
        rgb = image_ops.composite_background(rgb.astype(jnp.uint8), mask)
    resized = _resize(rgb.astype(jnp.float32), spec.image_size)
    mean = image_ops.SIGLIP_MEAN if spec.siglip_norm else spec.image_mean
    std = image_ops.SIGLIP_STD if spec.siglip_norm else spec.image_std
    return image_ops.normalize(resized, mean, std)


def _process_depth(spec: _CoreSpec, key, depth, mask):
    """(B, H, W) depth (+mask) -> (B, 1, S, S) float32 with the reference's
    transform order: [shift][noise] -> mask-multiply -> resize -> [standardize]
    (processor.py:59-78)."""
    depth = depth.astype(jnp.float32)
    if spec.train and spec.random_depth_shift:
        key, sub = jax.random.split(key)
        shift = jax.random.uniform(sub, (depth.shape[0], 1, 1),
                                   minval=spec.min_shift, maxval=spec.max_shift)
        depth = depth + shift
    if spec.train and spec.add_depth_noise:
        key, sub = jax.random.split(key)
        noise_keys = jax.random.split(sub, depth.shape[0])
        depth = jax.vmap(depth_ops.depth_noise)(noise_keys, depth)
    if spec.mask_depth and mask is not None:
        depth = depth_ops.mask_depth(depth, mask)
    out = _resize(depth, spec.image_size)[:, None]
    if spec.standardize_depth:
        out = jax.vmap(depth_ops.truncated_standardization)(out)
    return out


def _core(spec: _CoreSpec, key, rgb, depth, mask, ctx_rgb, ctx_depth, ctx_mask,
          ctx_count, labels):
    """The fused pipeline. All image inputs at original resolution; labels is a
    dict name -> (B, 8, 2) at original resolution (-1 padded)."""
    s = spec.image_size
    out: Dict[str, Any] = {}
    batch = None
    for x in (rgb, depth, mask):
        if x is not None:
            batch = x.shape[0]
            in_size = x.shape[1]
            break
    assert batch is not None

    # independent streams per consumer: reusing `key` would correlate the main
    # and context depth augmentations, and (threefry split being prefix-stable)
    # the spatial-augment draws with the depth-shift draws (ADVICE r1 low)
    depth_key, ctx_depth_key, spatial_key = jax.random.split(key, 3)

    if depth is not None:
        out["depth"] = _process_depth(spec, depth_key, depth, mask)
    if mask is not None:
        out["mask"] = depth_ops.round_mask(_resize(mask.astype(jnp.float32), s))[:, None]
    if rgb is not None:
        out["rgb"] = _process_rgb(spec, rgb, mask)
        # resized-only uint8 copy (kept float until after augmentation)
        out["raw_rgb"] = _resize(
            jnp.transpose(rgb, (0, 3, 1, 2)).astype(jnp.float32), s)

    if spec.n_context:
        t = spec.n_context
        in_frame = jnp.arange(t)[None, :] < ctx_count[:, None]  # (B, T)
        out["context_attention_mask"] = in_frame.astype(jnp.int32)
        cd = _process_depth(
            spec, ctx_depth_key,
            ctx_depth.reshape(batch * t, *ctx_depth.shape[2:]),
            ctx_mask.reshape(batch * t, *ctx_mask.shape[2:]) if ctx_mask is not None else None,
        ).reshape(batch, t, 1, s, s)
        # dummy (padding) frames are all-ones tensors (processor.py:104-115)
        sel = in_frame[:, :, None, None, None]
        out["depth_context"] = jnp.where(sel, cd, jnp.ones_like(cd))
        if spec.context_rgb and ctx_rgb is not None:
            cr = _process_rgb(
                spec,
                ctx_rgb.reshape(batch * t, *ctx_rgb.shape[2:]),
                ctx_mask.reshape(batch * t, *ctx_mask.shape[2:]) if ctx_mask is not None else None,
            ).reshape(batch, t, 3, s, s)
            out["rgb_context"] = jnp.where(sel, cr, jnp.ones_like(cr))

    # labels: scale from input to model resolution (processor.py:273-284)
    scale = in_size / s
    scaled = {}
    for k in spec.label_keys:
        lab = labels[k].astype(jnp.float32)
        valid = jnp.min(lab, axis=-1) >= 0  # (B, 8)
        scaled[k] = jnp.where(valid[..., None], lab / scale, lab)

    if spec.train and spec.spatial_augment and spec.label_keys:
        nk = len(spec.label_keys)
        allpix = jnp.concatenate([scaled[k] for k in spec.label_keys], axis=1)
        allvalid = jnp.min(allpix, axis=-1) >= 0

        warp_keys = [k for k in ("rgb", "depth", "raw_rgb") if k in out]
        warp_keys += [k for k in ("rgb_context", "depth_context") if k in out]
        if spec.augment_mask and "mask" in out:
            warp_keys.append("mask")
        images = {k: out[k] for k in warp_keys}

        aug_keys = jax.random.split(spatial_key, batch)
        aug = partial(
            spatial_augment, image_size=s, max_trials=spec.max_trials,
            rotate_range=spec.rotate_range, translate_range=spec.translate_range)
        images, allpix, _ = jax.vmap(
            lambda kk, im, px, pv: aug(kk, im, px, pv))(
                aug_keys, images, allpix, allvalid)
        out.update(images)
        for i, k in enumerate(spec.label_keys):
            scaled[k] = allpix[:, i * MAX_LABEL_POINTS : (i + 1) * MAX_LABEL_POINTS]

    for k in spec.label_keys:
        out[k] = scaled[k]

    if spec.train:
        for k in spec.label_keys:
            valid = jnp.min(scaled[k], axis=-1) >= 0
            out[f"{k}_heatmap"] = batched_gaussmap(
                scaled[k], valid, size=s, sigma=spec.sigma, strategy=spec.strategy)

    if "raw_rgb" in out:
        out["raw_rgb"] = jnp.transpose(
            jnp.clip(jnp.round(out["raw_rgb"]), 0, 255), (0, 2, 3, 1)
        ).astype(jnp.uint8)
    return out


class Processor:
    """Shared train/test/rollout preprocessing.

    ``cfg`` is the ``processor`` config node (conf/processor/default.yaml);
    constructor keywords mirror the reference's Processor.__init__
    (processor.py:26-120). ``autoprocessor_name`` selects SigLIP-style image
    normalization and tokenizer, as passing an AutoProcessor name does in the
    reference.
    """

    def __init__(self, cfg, partition: str, max_context_length: Optional[int] = None,
                 num_nodes: Optional[int] = None, neighbor_radius: Optional[float] = None,
                 voxel_size: Optional[float] = None, autoprocessor_name: Optional[str] = None,
                 seed: int = 0, spm_asset=None):
        cfg = dict(cfg)
        self.cfg = cfg
        self.partition = partition
        self.image_size = int(cfg["model_image_size"])
        self.requires_graph = bool(cfg.get("requires_graph", False))
        self.num_nodes = num_nodes
        self.neighbor_radius = neighbor_radius
        self.voxel_size = voxel_size
        self.max_context_length = max_context_length or 0
        self.process_context = max_context_length is not None
        self.autoprocessor_name = autoprocessor_name
        # explicit spiece.model (path or bytes) pins the vocabulary to THIS
        # model's asset — serving threads the checkpoint's sibling file /
        # export-artifact bytes here (data/tokenizers.build_tokenizer)
        self.spm_asset = spm_asset
        self.tokenize = build_tokenizer(cfg.get("text_encoder"),
                                        autoprocessor_name,
                                        spm_asset=spm_asset)
        self._rng = np.random.default_rng(seed)

        sa = dict(cfg.get("spatial_augmentations", {}))
        da = dict(cfg.get("depth_augmentations", {}))
        self._spec_base = dict(
            image_size=self.image_size,
            sigma=float(cfg.get("sigma", 5.0)),
            strategy=str(cfg.get("strategy", "gmm")),
            mask_depth=bool(cfg.get("mask_depth", True)),
            standardize_depth=bool(cfg.get("standardize_depth", False)),
            random_depth_shift=bool(da.get("random_depth_shift", False)),
            add_depth_noise=bool(da.get("add_depth_noise", False)),
            min_shift=float(da.get("min_shift", -0.2)),
            max_shift=float(da.get("max_shift", 0.2)),
            spatial_augment=bool(cfg.get("spatial_augment", True)),
            max_trials=int(sa.get("max_augmentation_trials", 5)),
            rotate_range=tuple(sa.get("rotate_augmentation", (-5.0, 6.0))),
            translate_range=tuple(sa.get("translate_augmentation", (-5.0, 6.0))),
            image_mean=tuple(cfg.get("image_mean", image_ops.CLIP_MEAN)),
            image_std=tuple(cfg.get("image_std", image_ops.CLIP_STD)),
            siglip_norm=autoprocessor_name is not None,
            augment_mask=bool(cfg.get("augment_mask", False)),
            train=partition == "train",
        )

    # ------------------------------------------------------------------
    # Raw-record construction (host side)
    # ------------------------------------------------------------------

    def make_raw(self, rgb=None, depth=None, mask=None, instruction=None,
                 matrix_world_to_camera=None, K=None, context=None,
                 **labels) -> Dict[str, Any]:
        """Assemble a fixed-schema raw record from dataset outputs.

        ``labels``: pick/place (or left_/right_ variants) pixel arrays at the
        input resolution, or None. Context is a list of dicts with
        depth/rgb/mask keys (latest last), truncated to ``max_context_length``.
        """
        raw: Dict[str, Any] = {}
        if rgb is not None:
            raw["rgb"] = np.asarray(rgb, np.uint8)
        if depth is not None:
            raw["depth"] = np.asarray(depth, np.float32)
        if mask is not None:
            raw["mask"] = np.asarray(mask, np.float32)
        if instruction is not None:
            raw["raw_instruction"] = instruction
            raw["instruction"] = self.tokenize(instruction)
        if matrix_world_to_camera is not None:
            raw["matrix_world_to_camera"] = np.asarray(matrix_world_to_camera, np.float32)
        if K is not None:
            raw["K"] = np.asarray(K, np.float32)

        if self.process_context:
            t = self.max_context_length
            frames = list(context or [])[-t:]
            raw["ctx_count"] = np.int32(len(frames))
            if depth is not None:
                h, w = raw["depth"].shape
            else:
                h = w = self.image_size
            raw["ctx_depth"] = np.ones((t, h, w), np.float32)
            raw["ctx_mask"] = np.ones((t, h, w), np.float32)
            if rgb is not None:
                raw["ctx_rgb"] = np.ones((t, h, w, 3), np.uint8)
            for i, item in enumerate(frames):
                raw["ctx_depth"][i] = item["depth"]
                if item.get("mask") is not None:
                    raw["ctx_mask"][i] = item["mask"]
                if rgb is not None and "rgb" in item:
                    raw["ctx_rgb"][i] = item["rgb"]

        label_keys = sorted(k for k in labels if "pick" in k or "place" in k)
        raw["label_keys"] = tuple(label_keys)
        for k in label_keys:
            raw[k] = pad_label(labels[k])
        return raw

    # ------------------------------------------------------------------
    # Batched device pipeline
    # ------------------------------------------------------------------

    def _spec(self, batch: Dict[str, Any]) -> _CoreSpec:
        return _CoreSpec(
            label_keys=tuple(batch.get("label_keys", ())),
            has_rgb="rgb" in batch,
            has_depth="depth" in batch,
            has_mask="mask" in batch,
            n_context=self.max_context_length if "ctx_depth" in batch else 0,
            context_rgb="ctx_rgb" in batch,
            **self._spec_base,
        )

    def process_batch(self, batch: Dict[str, Any],
                      key: Optional[jax.Array] = None) -> Dict[str, Any]:
        """Run the jitted pipeline on a collated raw batch (leading dim B).

        Non-array keys (strings, label_keys) pass through; graph construction
        (host-side, data-dependent) happens per sample before this call.
        """
        if key is None:
            key = jax.random.key(int(self._rng.integers(0, 2**31 - 1)))
        spec = self._spec(batch)
        labels = {k: jnp.asarray(batch[k]) for k in spec.label_keys}
        core = _jitted_core(spec)
        out = core(
            key,
            jnp.asarray(batch["rgb"]) if spec.has_rgb else None,
            jnp.asarray(batch["depth"]) if spec.has_depth else None,
            jnp.asarray(batch["mask"]) if spec.has_mask else None,
            jnp.asarray(batch["ctx_rgb"]) if spec.context_rgb else None,
            jnp.asarray(batch["ctx_depth"]) if spec.n_context else None,
            jnp.asarray(batch["ctx_mask"]) if spec.n_context else None,
            jnp.asarray(batch["ctx_count"]) if spec.n_context else None,
            labels,
        )
        for k in ("instruction", "raw_instruction"):
            if k in batch:
                out[k] = batch[k]
        for k in batch:
            if k.startswith("graph") or k == "pixel_sampled_pc" or k.endswith("_node_heatmap"):
                out[k] = batch[k]
        return out

    # ------------------------------------------------------------------
    # Per-sample path (evaluators / rollouts), reference-compatible call
    # ------------------------------------------------------------------

    def __call__(self, rgb=None, depth=None, mask=None, instruction=None,
                 matrix_world_to_camera=None, K=None, context=None, **labels):
        """Process one sample; returns numpy arrays without a batch dim for
        per-sample keys (matching the reference's per-item Processor)."""
        raw = self.make_raw(rgb=rgb, depth=depth, mask=mask, instruction=instruction,
                            matrix_world_to_camera=matrix_world_to_camera, K=K,
                            context=context, **labels)
        if self.requires_graph:
            raw.update(self._graph_features(raw))
        batch = {}
        for k, v in raw.items():
            if isinstance(v, np.ndarray):
                batch[k] = v[None]
            elif k in ("label_keys",):
                batch[k] = v
            elif isinstance(v, (np.integer, int)):
                batch[k] = np.asarray([v])
            else:
                batch[k] = [v]
        out = self.process_batch(batch)
        sample = {}
        for k, v in out.items():
            if isinstance(v, (jnp.ndarray, np.ndarray)) and getattr(v, "ndim", 0) > 0:
                sample[k] = np.asarray(v)[0]
            elif isinstance(v, list) and len(v) == 1:
                sample[k] = v[0]
            else:
                sample[k] = v
        return sample

    # ------------------------------------------------------------------
    # Graph pipeline (host side; reference processor.py:357-384)
    # ------------------------------------------------------------------

    def _graph_features(self, raw: Dict[str, Any]) -> Dict[str, Any]:
        assert "K" in raw, "Intrinsics are required for creating the graph"
        s = self.image_size
        depth = raw["depth"]
        scale = depth.shape[0] / s
        scaled_k = raw["K"].copy()
        scaled_k[0, :] /= scale
        scaled_k[1, :] /= scale
        depth_ori = np.asarray(_resize(depth[None], s))[0]
        mask_ori = np.asarray(
            depth_ops.round_mask(_resize(raw["mask"][None], s)))[0]
        m_w2c = raw["matrix_world_to_camera"]

        world = np.asarray(world_coords_from_depth(depth_ori, m_w2c, scaled_k))
        pc = world[..., :3].reshape(-1, 3)[mask_ori.reshape(-1) > 0].astype(np.float32)
        vox = voxelize_pointcloud(pc, self.voxel_size)
        sampled = fps(vox, self.num_nodes).astype(np.float32)

        centered = sampled - sampled.mean(axis=0)
        edges, edge_attr = compute_edge_attr(centered, self.neighbor_radius)

        n = self.num_nodes
        e_max = n * 16
        x = np.zeros((n, 3), np.float32)
        x[: len(centered)] = centered
        node_mask = np.zeros((n,), np.float32)
        node_mask[: len(centered)] = 1.0
        ei = np.zeros((2, e_max), np.int64)
        ea = np.zeros((e_max, 4), np.float32)
        em = np.zeros((e_max,), np.float32)
        ne = min(edges.shape[1], e_max)
        ei[:, :ne] = edges[:, :ne]
        ea[:ne] = edge_attr[:ne]
        em[:ne] = 1.0

        out = {"graph_x": x, "graph_node_mask": node_mask, "graph_edge_index": ei,
               "graph_edge_attr": ea, "graph_edge_mask": em}

        for k in raw.get("label_keys", ()):  # pick node targets
            if "pick" not in k:
                continue
            pix = raw[k]
            valid = pix.min(axis=-1) >= 0
            heat = np.zeros((n,), np.float32)
            if valid.any():
                p = pix[valid][0] / scale
                pos = np.asarray(world_from_pixel(p, depth_ori, m_w2c, scaled_k))
                d = ((sampled - pos) ** 2).sum(axis=1)
                heat[: len(sampled)] = (d == d.min()).astype(np.float32)
            out[f"{k}_node_heatmap"] = heat

        if self.partition == "test":
            pix = np.asarray(pixel_from_world(sampled, m_w2c, scaled_k))
            padded = np.zeros((2, n), np.float32)
            padded[:, : pix.shape[1]] = pix
            out["pixel_sampled_pc"] = padded.T
        return out

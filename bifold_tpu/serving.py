"""Fixed-shape batch-1 serving: image + instruction -> pixel Action.

The rollout-latency path SURVEY.md §7 calls out: closed-loop evaluation and
robot serving run batch-1 inference in the control loop, so the whole
pipeline — preprocessing, forward, heatmap decode — must be ONE pre-compiled
program with static shapes (text padded to the tokenizer's fixed length, one
image at the model's resolution), never recompiling across instructions.

    server = ServingModel.from_checkpoint("checkpoints/best.ckpt", cfg)
    action = server.predict(rgb, depth, mask, "fold the left sleeve in")

``predict`` accepts raw host arrays at any square input resolution (the
resize matrices re-trace only when the input resolution changes) and returns
a numpy-backed Action plus optional raw heatmaps.
"""

from __future__ import annotations

import functools
import re
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bifold_tpu.config import Config
from bifold_tpu.data.processor import Processor
from bifold_tpu.env.action import Action
from bifold_tpu.models import build_model, decode_action

__all__ = ["ServingModel", "ServingPolicy", "ExportedServingModel",
           "make_serve_program", "quantize_weights", "dequantize_weights"]

_INT_INPUTS = ("instruction", "ctx_count")
_U8_INPUTS = ("rgb", "ctx_rgb")
_BINARY_INPUTS = ("mask", "ctx_mask")  # 0/1 floats travel as uint8
_DEPTH_INPUTS = ("depth", "ctx_depth")


def _spm_asset_bytes(processor) -> Optional[bytes]:
    """The spiece.model bytes backing ``processor``'s tokenizer, for
    embedding into export artifacts: the explicitly-pinned asset first,
    else whatever global resolution the processor's build would have found.
    None for non-sentencepiece tokenizers (CLIP BPE, hash fallback)."""
    asset = getattr(processor, "spm_asset", None)
    if isinstance(asset, bytes):
        return asset
    if asset is not None:
        from pathlib import Path
        return Path(asset).read_bytes()
    if processor.autoprocessor_name:
        from bifold_tpu.data.tokenizers import siglip_spm_path
        found = siglip_spm_path(processor.autoprocessor_name)
        if found is not None:
            return found.read_bytes()
    return None


def _stack_raws(raws):
    """Stack N make_raw records into one batched observation dict."""
    batched = {k: np.stack([np.asarray(r[k]) for r in raws])
               for k, v in raws[0].items() if isinstance(v, np.ndarray)}
    if "ctx_count" in raws[0]:
        batched["ctx_count"] = np.asarray([r["ctx_count"] for r in raws])
    return batched


def _pack_observation(batched, depth_f16: bool):
    """Pack raw observation arrays into one flat BYTE buffer (single upload;
    a tunneled TPU moves ~25 MB/s, so images travel as uint8, float/int
    payloads as raw bytes bitcast back on device). Returns (flat, schema)
    where schema is a tuple of (name, byte_offset, shape)."""
    parts, schema, off = [], [], 0
    for name in ("rgb", "depth", "mask", "ctx_rgb", "ctx_depth",
                 "ctx_mask", "ctx_count", "instruction"):
        if name not in batched:
            continue
        arr = batched[name]
        if name in _BINARY_INPUTS:
            # masks travel 255-quantized on the 1-byte wire and are divided
            # by 255 on device: binary {0,1} masks round-trip exactly, and
            # SOFT masks (anti-aliased edges, /255 PNG alphas — every k/255
            # value is exact) reach the serve program's composite/mask_depth
            # with the same soft values the host Processor path sees. An
            # earlier wire rounded to {0,1} here, which hard-edged the
            # composite vs the host path on soft-masked inputs.
            payload = np.clip(
                np.round(np.ravel(arr).astype(np.float32) * 255.0),
                0, 255).astype(np.uint8)
        elif name in _U8_INPUTS:
            payload = np.ravel(arr).astype(np.uint8)
        elif name in _INT_INPUTS:
            payload = np.ravel(arr).astype(np.int32).view(np.uint8)
        elif depth_f16 and name in _DEPTH_INPUTS:
            payload = np.ravel(arr).astype(np.float16).view(np.uint8)
        else:
            payload = np.ravel(arr).astype(np.float32).view(np.uint8)
        parts.append(payload)
        schema.append((name, off, arr.shape))
        off += payload.size
    return np.concatenate(parts), tuple(schema)


_QUANT_TAG = "__int8_q__"

# gather/add-consumed tables: vocab token embeddings, positional embeddings,
# learned modality tokens. Matched per path SEGMENT at word boundaries so
# e.g. "convtranspose_0" ("pos" inside "transpose") stays quantized.
# `positional` covers the CLIP towers' "positional_embedding" (the bare
# "position" alternative needs a boundary right after, so it misses it);
# an exact "embedding(s)" segment is flax nn.Embed's leaf param name, which
# is gather-consumed by construction (T5's vocab table lives at
# shared/embedding — no name-based alternative catches it). A SUFFIX match
# on "_embedding" would be wrong: patch_embedding/kernel is a conv matmul
# weight and must stay quantized (its leaf is "kernel", never "embedding").
_QUANT_EXCLUDE = re.compile(
    r"(^|_)(pos|position|positional|token)s?($|_)|^embeddings?$")


@functools.partial(jax.jit, static_argnums=1)
def _quantize_leaf(x, reduce_axes):
    """int8 payload + f32 scale for one weight leaf, computed ON DEVICE (an
    on-device param tree never round-trips to host — quantizing a live
    trainer's params for the eval ServingPolicy would otherwise pull the
    full tree over the interconnect every eval epoch)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=reduce_axes, keepdims=True)
    scale = absmax / 127.0
    q = jnp.clip(jnp.round(xf / jnp.maximum(scale, 1e-30)),
                 -127, 127).astype(jnp.int8)
    return q, scale


def quantize_weights(tree, min_size: int = 2 ** 16):
    """Symmetric per-output-channel int8 weight-only quantization of large
    MATMUL-weight leaves. Excluded: small leaves (LayerNorm scales, biases
    — exactness is cheap), and gather/add-consumed tables (vocab token
    embeddings, positional embeddings, learned modality tokens —
    ``_QUANT_EXCLUDE`` over the param path): those are never a matmul
    operand, so int8 saves no MXU-read bandwidth, and the in-program
    dequantize would materialize the FULL vocab table per call where the
    float original only pays a tiny per-token gather. patch_embedding (a
    conv matmul) stays quantized.

    Scale granularity: per output channel (last axis), and additionally per
    leading axis for ndim >= 3 — the nn.scan transformer stacks store
    kernels as (depth, in, out), and one scale shared across the whole
    stack would quantize a quiet layer into a few effective levels of the
    loudest layer's range.

    The dequantize runs INSIDE the serve program, where XLA fuses the
    int8 -> compute-dtype convert into the consuming matmul's operand read
    — so quantized leaves cut weight HBM reads and artifact bytes ~4x vs
    f32 masters (~2x vs the default bf16-precast serve path).
    Each quantized leaf becomes a {_QUANT_TAG: int8, "scale": f32} subtree
    that :func:`dequantize_weights` restores."""
    def q(path, x):
        segs = [str(getattr(k, "key", k)).lower() for k in path]
        if (any(_QUANT_EXCLUDE.search(s) for s in segs)
                or not (hasattr(x, "ndim") and x.ndim >= 2
                        and x.size >= min_size
                        and x.dtype in (jnp.float32, jnp.bfloat16))):
            return x
        reduce_axes = ((0,) if x.ndim == 2
                       else tuple(range(1, x.ndim - 1)))
        qv, scale = _quantize_leaf(jnp.asarray(x), reduce_axes)
        return {_QUANT_TAG: qv, "scale": scale}
    return jax.tree_util.tree_map_with_path(q, tree)


def dequantize_weights(tree, compute_dtype):
    """Inverse of :func:`quantize_weights`; identity on unquantized trees
    (so every serve program can call it unconditionally)."""
    def is_q(v):
        return isinstance(v, dict) and _QUANT_TAG in v

    def dq(v):
        if is_q(v):
            return v[_QUANT_TAG].astype(compute_dtype) \
                * v["scale"].astype(compute_dtype)
        return v

    return jax.tree_util.tree_map(dq, tree, is_leaf=is_q)


def make_serve_program(model, threshold, fields, spec, schema,
                       depth_f16: bool, mesh=None):
    """Build the jitted packed-bytes -> (pixel actions, raw outputs) serve
    program (module-level so compile-only checks can lower it against
    abstract variables — e.g. the sharded-serving HLO assertion in
    __graft_entry__ — without materializing flagship weights).

    ``mesh``: shard the pooled batch over the mesh's data axes right after
    unpacking the wire (the flat byte upload itself stays replicated — its
    per-input sections interleave batch rows, so only the unpacked arrays
    have a batch dim to shard). Weights ride whatever sharding the caller
    placed them with (tp/fsdp via ``parallel.param_sharding``). Skipped
    per-input when the batch dim does not divide the data axes."""
    from bifold_tpu.data.processor import _core

    if mesh is not None:
        from bifold_tpu import parallel
        batch_sh = parallel.batch_sharding(mesh)
        n_data = int(np.prod([mesh.shape[a]
                              for a in batch_sh.spec[0]])) if batch_sh.spec \
            else 1

    def serve(variables, flat):
        variables = dequantize_weights(
            variables, getattr(model, "dtype", jnp.float32) or jnp.float32)
        inputs = {}
        for name, off, shape in schema:
            size = int(np.prod(shape))
            if name in _U8_INPUTS:
                x = flat[off:off + size].reshape(shape)
            elif name in _BINARY_INPUTS:
                # inverse of the 255-quantized mask wire (see
                # _pack_observation): k/255 restores soft values exactly
                x = flat[off:off + size].reshape(shape).astype(jnp.float32) \
                    / np.float32(255.0)
            elif depth_f16 and name in _DEPTH_INPUTS:
                raw_bytes = flat[off:off + 2 * size].reshape(size, 2)
                x = jax.lax.bitcast_convert_type(raw_bytes, jnp.float16)
                x = x.reshape(shape).astype(jnp.float32)
            else:
                # 4-byte payloads travel as raw bytes; bitcast on device
                dtype = jnp.int32 if name in _INT_INPUTS else jnp.float32
                raw_bytes = flat[off:off + 4 * size].reshape(size, 4)
                x = jax.lax.bitcast_convert_type(raw_bytes, dtype)
                x = x.reshape(shape)
            if mesh is not None and shape[0] % n_data == 0:
                x = jax.lax.with_sharding_constraint(x, batch_sh)
            inputs[name] = x
        # test-partition spec: no stochastic augmentation; key is unused
        sample = _core(spec, jax.random.key(0), inputs.get("rgb"),
                       inputs.get("depth"), inputs.get("mask"),
                       inputs.get("ctx_rgb"), inputs.get("ctx_depth"),
                       inputs.get("ctx_mask"), inputs.get("ctx_count"), {})
        sample["instruction"] = inputs["instruction"]
        out = model.apply(variables, sample, deterministic=True)
        decoded = decode_action(
            out, sample, is_bimanual=model.is_bimanual,
            constrain_pick_mask=getattr(model, "constrain_pick_mask", True),
            threshold=threshold)
        # pack the pixel fields into ONE array -> one device->host fetch
        packed = jnp.stack([decoded[f].astype(jnp.float32)
                            for f in fields], axis=1)  # (B, F, 2)
        return packed, out

    return jax.jit(serve)


class ServingModel:
    def __init__(self, model, variables, processor: Processor,
                 threshold: Optional[float] = None,
                 depth_wire_dtype: str = "float32",
                 cast_params: bool = True,
                 quantize: Optional[str] = None,
                 quantize_min_size: int = 2 ** 16,
                 mesh=None):
        assert quantize in (None, "int8")
        self.model = model
        self.mesh = mesh
        self.variables = jax.tree_util.tree_map(jnp.asarray, variables)
        self.quantize = quantize
        if quantize == "int8":
            # weight-only int8 (per-output-channel symmetric), quantized
            # from the checkpoint as stored — f32 masters for reference-
            # converted checkpoints; bf16-rounded frozen towers for trainer
            # checkpoints saved under the precast_frozen default (the
            # full-scale decision check trains through the precast path, so
            # its argmax-agreement result covers exactly this case).
            # Supersedes the bf16 precast for the big leaves (dequant emits
            # compute dtype)
            self.variables = quantize_weights(self.variables,
                                              min_size=quantize_min_size)
            cast_params = False
        # pre-cast big float32 leaves to the model's compute dtype ONCE:
        # the forward casts them per use anyway (flax dtype semantics), so
        # results are identical (asserted in test_serving_precast), but the
        # per-call f32->bf16 weight converts measured ~1.5 ms of the 6.5 ms
        # on-chip serve time (and doubled the weights' HBM reads). Small
        # leaves (LayerNorm scales, biases) stay f32 — some consumers read
        # them at full precision.
        cdtype = getattr(model, "dtype", None)
        if cast_params and cdtype is not None and cdtype != jnp.float32:
            def _cast(x):
                if (hasattr(x, "dtype") and x.dtype == jnp.float32
                        and x.size >= 2 ** 16):
                    return x.astype(cdtype)
                return x
            self.variables = jax.tree_util.tree_map(_cast, self.variables)
        if mesh is not None:
            # multi-chip serving: tp/fsdp-shard the weights (Megatron
            # kernels over tp; ZeRO large leaves over fsdp — same
            # name-keyed rules as training) and let the serve program
            # shard pooled batches over the data axes. A quantized tree
            # composes: the int8 payload shards like its kernel and the
            # per-output-channel scale follows the kernel's output axis.
            from bifold_tpu import parallel
            self.variables = jax.device_put(
                self.variables, parallel.param_sharding(mesh, self.variables))
        self.processor = processor
        self.threshold = float(model.threshold if threshold is None else threshold)
        # depth dominates the observation upload (float32 H*W vs uint8 rgb);
        # "float16" halves its wire bytes (~0.3 mm quantization at ~1 m —
        # far below the depth sensor noise the pipeline already models)
        assert depth_wire_dtype in ("float32", "float16")
        self._depth_wire_f16 = depth_wire_dtype == "float16"

        def _serve(variables, batch):
            variables = dequantize_weights(
                variables, getattr(model, "dtype", jnp.float32) or jnp.float32)
            out = model.apply(variables, batch, deterministic=True)
            decoded = decode_action(
                out, batch, is_bimanual=model.is_bimanual,
                constrain_pick_mask=getattr(model, "constrain_pick_mask", True),
                threshold=self.threshold)
            return decoded, out

        self._serve = jax.jit(_serve)
        # one-dispatch programs (preprocess + forward + decode fused), keyed
        # by which raw inputs are present; jit handles shape re-traces
        self._e2e_programs: Dict[Any, Any] = {}

    _INT_INPUTS = _INT_INPUTS
    _U8_INPUTS = _U8_INPUTS
    _BINARY_INPUTS = _BINARY_INPUTS
    _DEPTH_INPUTS = _DEPTH_INPUTS

    def _e2e_program(self, spec, schema):
        """Jitted raw-pixels->Action program: the processor ``_core``, the
        model forward, and the decode run as ONE device dispatch — over a
        tunneled TPU every extra dispatch AND every transferred buffer costs
        a full RTT (~30 ms), so the control loop must issue exactly one
        upload, one dispatch, and one fetch.

        ``schema``: tuple of (name, offset, shape) describing how the raw
        inputs are packed into the single flat float32 upload.
        """
        key = (spec, schema, self._depth_wire_f16)
        if key in self._e2e_programs:
            return self._e2e_programs[key]
        prog = make_serve_program(self.model, self.threshold,
                                  self._action_fields(), spec, schema,
                                  self._depth_wire_f16, mesh=self.mesh)
        self._e2e_programs[key] = prog
        return prog

    def _action_fields(self):
        return (("left_pick", "right_pick", "left_place", "right_place")
                if self.model.is_bimanual else ("pick", "place"))

    # ------------------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, checkpoint_path: str, cfg: Config | dict,
                        threshold: Optional[float] = None,
                        depth_wire_dtype: str = "float32",
                        quantize: Optional[str] = None,
                        quantize_min_size: int = 2 ** 16,
                        mesh=None) -> "ServingModel":
        from bifold_tpu.utils.checkpoint import load_checkpoint

        cfg = Config(cfg) if not isinstance(cfg, Config) else cfg
        model = build_model(cfg["model"])
        payload = load_checkpoint(checkpoint_path, restore_rng=False)
        variables = {"params": payload["params"], **(payload.get("extra_vars") or {})}
        mcl = dict(cfg["model"]).get("context_length")
        # the checkpoint's OWN tokenizer asset (models/convert.py copies
        # spiece.model next to the converted .ckpt) — threaded explicitly so
        # a process serving two checkpoints never reuses a stale global
        # selection
        from pathlib import Path as _P
        spm_sibling = _P(checkpoint_path).parent / "spiece.model"
        processor = Processor(
            dict(cfg["processor"]), partition="test",
            max_context_length=mcl,
            autoprocessor_name=dict(cfg["model"]).get("automodel_name"),
            spm_asset=spm_sibling if spm_sibling.exists() else None)
        return cls(model, variables, processor, threshold=threshold,
                   depth_wire_dtype=depth_wire_dtype, quantize=quantize,
                   quantize_min_size=quantize_min_size, mesh=mesh)

    # ------------------------------------------------------------------

    def predict(self, rgb=None, depth=None, mask=None, instruction: str = "",
                context: Optional[List[Dict]] = None,
                return_raw_output: bool = False):
        """One observation -> Action in ONE device dispatch (tokenization and
        record assembly stay host-side; everything numeric — resize,
        composite, normalize, depth transform, forward, decode — is a single
        jitted program). Static shapes: re-traces only when the input camera
        resolution changes. Graph-conditioned models keep the two-dispatch
        path (graph construction is host-side and data-dependent)."""
        if self.processor.requires_graph:
            return self._predict_two_dispatch(rgb, depth, mask, instruction,
                                              context, return_raw_output)
        # one pipeline: batch-1 IS predict_batch of one observation (keeps
        # the packing/spec/decode logic from drifting between the two)
        return self.predict_batch(
            [dict(rgb=rgb, depth=depth, mask=mask, instruction=instruction,
                  context=context)],
            return_raw_output=return_raw_output)

    def predict_batch(self, observations: List[Dict],
                      pad_to: Optional[int] = None,
                      return_raw_output: bool = False):
        """K observations -> K Actions in ONE padded fixed-shape dispatch.

        ``observations``: list of predict()-kwarg dicts (rgb, depth, mask,
        instruction, context). ``pad_to`` repeats the last observation so
        every call compiles at one batch shape (a lockstep evaluator pool);
        padded rows are dropped from the returned Action. This is the
        serving side of the parallel closed-loop evaluators: K trials share
        one upload (uint8 rgb + f16-optional depth wire), one dispatch, one
        fetch — on a tunneled runtime the fixed ~30 ms RTT and the wire
        bytes dominate batch-1 rollout inference, so both amortize K-fold.
        """
        if self.processor.requires_graph:
            # host-side data-dependent graph construction: no batched
            # one-dispatch program; serve per sample
            results = [self._predict_two_dispatch(
                o.get("rgb"), o.get("depth"), o.get("mask"),
                o.get("instruction", ""), o.get("context"), return_raw_output)
                for o in observations]
            acts = [r[0] for r in results] if return_raw_output else results
            fields = self._action_fields()
            action = Action(**{f: np.concatenate(
                [np.asarray(getattr(a, f)).reshape(1, -1)[:, :2]
                 for a in acts]) for f in fields})
            if return_raw_output:
                raw_dicts = [r[1] for r in results]
                raw = {k: np.concatenate([np.asarray(r[k])
                                          for r in raw_dicts])
                       for k in raw_dicts[0]}
                return action, raw
            return action

        n = len(observations)
        assert n > 0, "predict_batch needs at least one observation"
        raws = [self.processor.make_raw(
            rgb=o.get("rgb"), depth=o.get("depth"), mask=o.get("mask"),
            instruction=o.get("instruction", ""), context=o.get("context"))
            for o in observations]
        if pad_to and pad_to > n:
            # pad AFTER host preprocessing: the duplicate rows reuse the
            # already-built raw record instead of re-tokenizing per step
            raws = raws + [raws[-1]] * (pad_to - n)
        batched = _stack_raws(raws)
        spec = self.processor._spec(batched)
        flat, schema = _pack_observation(batched, self._depth_wire_f16)

        prog = self._e2e_program(spec, tuple(schema))
        packed, out = prog(self.variables, flat)
        packed = np.asarray(packed)[:n]  # the single fetch; padding dropped
        fields = self._action_fields()
        action = Action(**{f: packed[:, i] for i, f in enumerate(fields)})
        if return_raw_output:
            # slice the padding out of the raw outputs too — the Action/raw
            # row contract must match batch-1 predict's
            return action, jax.tree_util.tree_map(
                lambda a: np.asarray(a)[:n], out)
        return action

    def program_memory(self, rgb=None, depth=None, mask=None,
                       instruction: str = "", context=None):
        """``CompiledMemoryStats`` of the one-dispatch serve program for
        this observation shape (same jit cache predict uses — no extra
        compile after a warmup/predict at the shape). None for graph models
        or when the backend doesn't support memory analysis. Feeds the
        bench contract's serve_peak_hbm_bytes (BENCH_NOTES.md)."""
        if self.processor.requires_graph:
            return None
        raws = [self.processor.make_raw(rgb=rgb, depth=depth, mask=mask,
                                        instruction=instruction,
                                        context=context)]
        batched = _stack_raws(raws)
        spec = self.processor._spec(batched)
        flat, schema = _pack_observation(batched, self._depth_wire_f16)
        prog = self._e2e_program(spec, tuple(schema))
        try:
            ma = prog.lower(self.variables, flat).compile().memory_analysis()
            if isinstance(ma, (list, tuple)):
                ma = ma[0]
            return ma
        except Exception:  # noqa: BLE001 - best-effort introspection
            return None

    def _predict_two_dispatch(self, rgb, depth, mask, instruction, context,
                              return_raw_output):
        """Processor dispatch + serve dispatch (graph models only)."""
        sample = self.processor(rgb=rgb, depth=depth, mask=mask,
                                instruction=instruction, context=context)
        batch: Dict[str, Any] = {}
        for k, v in sample.items():
            if isinstance(v, np.ndarray) and v.dtype != object and v.ndim > 0 \
                    and not isinstance(v.flat[0], str):
                batch[k] = jnp.asarray(v)[None]
        decoded, out = self._serve(self.variables, batch)
        decoded = jax.tree_util.tree_map(np.asarray, decoded)
        if self.model.is_bimanual:
            action = Action(left_pick=decoded["left_pick"],
                            right_pick=decoded["right_pick"],
                            left_place=decoded["left_place"],
                            right_place=decoded["right_place"])
        else:
            action = Action(pick=decoded["pick"], place=decoded["place"])
        if return_raw_output:
            return action, jax.tree_util.tree_map(np.asarray, out)
        return action

    def warmup(self, input_size: int, pool: Optional[int] = None) -> None:
        """Pre-compile for a camera resolution before entering the control
        loop (first compile is seconds-to-minutes; subsequent calls are ms).
        ``pool``: also a pooled-batch shape — the padded program a dynamic
        batcher or lockstep evaluator dispatches is a DIFFERENT compile than
        batch-1."""
        rng = np.random.default_rng(0)
        obs = dict(
            rgb=rng.integers(0, 255, (input_size, input_size, 3),
                             dtype=np.uint8),
            depth=rng.random((input_size, input_size)).astype(np.float32),
            mask=np.ones((input_size, input_size), np.float32),
            instruction="warmup")
        if pool and int(pool) > 1:
            self.predict_batch([obs], pad_to=int(pool))
        else:
            self.predict(**obs)

    # ------------------------------------------------------------------
    # Deployment artifact (jax.export)
    # ------------------------------------------------------------------

    def export(self, path, rgb=None, depth=None, mask=None,
               instruction: str = "export", context=None,
               platforms: Optional[List[str]] = None, batch: int = 1):
        """Serialize the one-dispatch serve program for ONE observation shape
        (at ``batch`` pooled rows per dispatch) into a deployment artifact: serialized StableHLO (portable across
        jax versions per jax.export's compatibility guarantees) + host
        weights + the byte-packing schema + the processor config. Loading
        via :meth:`load_exported` never rebuilds the flax model or retraces
        — the TPU-native analogue of a torchscript/ONNX serving export.

        ``platforms`` pins the lowering targets (default: the current
        backend); pass ``["tpu", "cpu"]`` to make one artifact servable on
        both. Graph-conditioned models are not exportable (host-side
        data-dependent graph construction).
        """
        if self.processor.requires_graph:
            raise NotImplementedError(
                "graph-conditioned models build data-dependent graphs "
                "host-side; the one-dispatch export does not cover them")
        if self.mesh is not None:
            raise NotImplementedError(
                "export of a mesh-sharded server would pin the artifact to "
                "this device count/topology; export from an unsharded "
                "ServingModel (mesh=None) — the artifact serves unsharded — "
                "and construct a live ServingModel(mesh=...) when you need "
                "multi-chip serving")
        from jax import export as jax_export

        raw = self.processor.make_raw(rgb=rgb, depth=depth, mask=mask,
                                      instruction=instruction, context=context)
        # ``batch`` pins the exported program's batch dimension: K pooled
        # observations per dispatch (the lockstep evaluators' shape), or the
        # classic batch-1 control-loop program
        batched = _stack_raws([raw] * max(1, int(batch)))
        spec = self.processor._spec(batched)
        flat, schema = _pack_observation(batched, self._depth_wire_f16)

        prog = self._e2e_program(spec, schema)
        plats = list(platforms) if platforms else None
        exported = jax_export.export(prog, platforms=plats)(
            jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                self.variables),
            jax.ShapeDtypeStruct(flat.shape, flat.dtype))

        import pickle
        payload = {
            "serialized": exported.serialize(),
            "variables": jax.tree_util.tree_map(np.asarray, self.variables),
            "schema": schema,
            "depth_wire_f16": self._depth_wire_f16,
            "fields": self._action_fields(),
            "processor_cfg": dict(self.processor.cfg),
            # None (not 0) when context is off: Processor keys
            # process_context on `max_context_length is not None`
            "max_context_length": (self.processor.max_context_length
                                   if self.processor.process_context else None),
            "autoprocessor_name": self.processor.autoprocessor_name,
            # embed the tokenizer vocabulary so the artifact tokenizes
            # exactly on any host (spiece.model is <1 MB); bytes if the
            # serving processor was pinned to an asset, else whatever the
            # global resolution found at export time
            "spm_model_bytes": _spm_asset_bytes(self.processor),
            "platforms": plats or [jax.default_backend()],
            "batch": max(1, int(batch)),
        }
        path = __import__("pathlib").Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(path.suffix + ".tmp")
        with open(tmp, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        tmp.replace(path)
        return path

    @staticmethod
    def load_exported(path) -> "ExportedServingModel":
        return ExportedServingModel(path)


class ExportedServingModel:
    """Serve from a :meth:`ServingModel.export` artifact: deserialized
    StableHLO called through jit — no model construction, no flax, no
    retracing; the host side only tokenizes and byte-packs the observation
    (the exact packing recorded in the artifact's schema)."""

    def __init__(self, path):
        import pickle

        from jax import export as jax_export

        with open(path, "rb") as f:
            p = pickle.load(f)
        self._exported = jax_export.deserialize(p["serialized"])
        self._call = jax.jit(self._exported.call)
        self.variables = jax.tree_util.tree_map(jnp.asarray, p["variables"])
        self.schema = p["schema"]
        self._depth_wire_f16 = p["depth_wire_f16"]
        self.fields = p["fields"]
        self.platforms = p["platforms"]
        # batch the program was exported at (older artifacts: derive from
        # the schema's leading dim)
        self.batch = int(p.get("batch") or self.schema[0][2][0])
        self.processor = Processor(
            p["processor_cfg"], partition="test",
            max_context_length=p["max_context_length"],
            autoprocessor_name=p["autoprocessor_name"],
            spm_asset=p.get("spm_model_bytes"))

    def predict(self, rgb=None, depth=None, mask=None, instruction: str = "",
                context: Optional[List[Dict]] = None,
                return_raw_output: bool = False):
        return self.predict_batch(
            [dict(rgb=rgb, depth=depth, mask=mask, instruction=instruction,
                  context=context)],
            return_raw_output=return_raw_output)

    def warmup(self, input_size: Optional[int] = None,
               pool: Optional[int] = None) -> None:
        """Pre-compile the deserialized program. The artifact pins its one
        observation shape (and its pooled batch), so the camera resolution
        comes from the recorded schema; ``input_size``/``pool`` are accepted
        for interface parity with :meth:`ServingModel.warmup` and ignored."""
        shapes = {name: shape for name, _, shape in self.schema}
        rng = np.random.default_rng(0)
        obs: Dict[str, Any] = {}
        if "rgb" in shapes:
            obs["rgb"] = rng.integers(0, 255, shapes["rgb"][1:],
                                      dtype=np.uint8)
        if "depth" in shapes:
            obs["depth"] = rng.random(shapes["depth"][1:]).astype(np.float32)
        if "mask" in shapes:
            obs["mask"] = np.ones(shapes["mask"][1:], np.float32)
        if "ctx_rgb" in shapes:
            t = shapes["ctx_rgb"][1]
            obs["context"] = [dict(
                rgb=rng.integers(0, 255, shapes["ctx_rgb"][2:],
                                 dtype=np.uint8),
                depth=(rng.random(shapes["ctx_depth"][2:]).astype(np.float32)
                       if "ctx_depth" in shapes else None),
                mask=(np.ones(shapes["ctx_mask"][2:], np.float32)
                      if "ctx_mask" in shapes else None)) for _ in range(t)]
        self.predict(**obs, instruction="warmup")

    def predict_batch(self, observations: List[Dict],
                      pad_to: Optional[int] = None,
                      return_raw_output: bool = False):
        """Up to ``self.batch`` observations through the exported program
        (short lists pad with the last observation; padded rows dropped).
        ``pad_to`` is accepted for ServingPolicy compatibility — the
        exported program always runs at ``self.batch`` rows, so it only
        validates the requested pool fits."""
        n = len(observations)
        if pad_to and pad_to > self.batch:
            raise ValueError(
                f"pool of {pad_to} exceeds the exported batch {self.batch}; "
                f"re-export with batch={pad_to}")
        if not 1 <= n <= self.batch:
            raise ValueError(
                f"exported program serves 1..{self.batch} observations per "
                f"call, got {n} (re-export with batch={n} for bigger pools)")
        raws = [self.processor.make_raw(
            rgb=o.get("rgb"), depth=o.get("depth"), mask=o.get("mask"),
            instruction=o.get("instruction", ""), context=o.get("context"))
            for o in observations]
        raws = raws + [raws[-1]] * (self.batch - n)
        flat, schema = _pack_observation(_stack_raws(raws),
                                         self._depth_wire_f16)
        if schema != tuple(self.schema):
            raise ValueError(
                f"observation layout {schema} does not match the exported "
                f"artifact's {tuple(self.schema)}; export covers exactly one "
                "observation shape")
        packed, out = self._call(self.variables, flat)
        packed = np.asarray(packed)[:n]
        action = Action(**{f: packed[:, i] for i, f in enumerate(self.fields)})
        if return_raw_output:
            return action, jax.tree_util.tree_map(
                lambda a: np.asarray(a)[:n], out)
        return action


class ServingPolicy:
    """Adapt a :class:`ServingModel` into the closed-loop evaluators' policy
    callable. ``wants_raw = True`` tells the evaluators to hand over RAW
    observations (uint8 rgb, float depth/mask, instruction string, context
    frame list) instead of host-processed float32 samples — preprocessing
    then runs on device inside the one-dispatch serve program, and the wire
    carries the packed byte observation (~10x fewer bytes than the processed
    tensors; the f32 sample upload dominated rollout inference on the
    tunneled runtime, tools/rollout_bench.py).

    A single observation dict serves batch-1; a list serves one padded
    batched dispatch (the lockstep parallel evaluators pass their pool).
    Returns ``(Action, None)`` — the raw heatmaps stay on device (fetching
    them would pay the transfer the adapter exists to avoid)."""

    wants_raw = True

    def __init__(self, server: ServingModel):
        self.server = server

    def __call__(self, obs, pad_to: Optional[int] = None):
        if isinstance(obs, (list, tuple)):
            return self.server.predict_batch(list(obs), pad_to=pad_to), None
        return self.server.predict(**obs), None

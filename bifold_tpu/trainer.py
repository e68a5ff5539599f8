"""Trainer: the train/eval driver (L6 of the reference's layer map).

Counterpart of /root/reference/bifold/__main__.py:38-394 (``Trainer``):
seeding, model + dataloader construction, the epoch loop with per-step
scheduler and gradient clipping, periodic pixel eval driving best/last
checkpoints (with RNG states for bitwise resume), eval-result yaml merging,
and the eval dispatch between pixel metrics and the SoftGym closed loop.

TPU-native differences:
- the step is one donated, jitted SPMD program over the (dp, fsdp, tp) mesh
  (parallel.make_train_step); batches are device-sharded over dp x fsdp;
- freezing is an optimizer mask (models.trainable_mask), not requires_grad;
- the "device" is the mesh — there is no .to(device) anywhere;
- throughput (samples/sec/chip) and step time are first-class logged metrics
  (the BASELINE.md north-star numbers).
"""

from __future__ import annotations

import random
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from bifold_tpu import parallel
from bifold_tpu.config import Config, save as save_config
from bifold_tpu.data import get_dataloaders
from bifold_tpu.env.action import Action
from bifold_tpu.losses import build_loss
from bifold_tpu.metrics import Metrics
from bifold_tpu.models import (build_model, decode_action, precast_frozen,
                               trainable_mask)
from bifold_tpu.optim import build_optimizer
from bifold_tpu.utils.checkpoint import (AsyncCheckpointer, latest_checkpoint,
                                         load_checkpoint, save_checkpoint)
from bifold_tpu.utils.logging import Writer

__all__ = ["Trainer", "seed_randomness", "split_batch"]


@jax.jit
def _stack_batches_on_device(*batches):
    """Stack k device-resident processed batches along a new leading scan
    axis in ONE compiled program (no host round-trip; see the fused-branch
    comment in Trainer.train_epoch). Retraces once per (k, batch-shape)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)


def seed_randomness(seed: int) -> jax.Array:
    """Seed python/numpy and return the root jax key
    (reference __main__.py:106-110 seeds random/np/torch/cuda)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


_HOST_KEYS = ("raw_instruction", "label_keys")


def split_batch(batch: Dict[str, Any]):
    """(device_arrays, host_side) — strings and metadata stay off-device."""
    device = {k: v for k, v in batch.items()
              if k not in _HOST_KEYS and not isinstance(v, (list, tuple, str))}
    host = {k: v for k, v in batch.items() if k not in device}
    return device, host


class Preempted(Exception):
    """Raised at a step boundary after SIGTERM: the preemption notice of
    managed TPU VMs. train() catches it, writes a step-granular last.ckpt,
    and returns cleanly — the next run auto-resumes mid-epoch."""


class Trainer:
    def __init__(self, cfg: Config, run_dir: Optional[str | Path] = None,
                 run_name: Optional[str] = None):
        self.cfg = cfg
        self.run_dir = Path(run_dir if run_dir is not None else cfg["run_dir"])
        self.run_dir.mkdir(parents=True, exist_ok=True)
        save_config(cfg, self.run_dir / "config.yaml")

        self.key = seed_randomness(int(cfg["seed"]))
        mesh_cfg = dict(cfg.get("mesh", {}))
        pp_microbatches = int(mesh_cfg.pop("pp_microbatches", 0) or 0)
        self.mesh = parallel.make_mesh(mesh_cfg)
        # models read pp/ep routing (gpipe, expert_parallel_ffn) from the
        # active mesh at trace time — set before any step is traced
        parallel.set_active_mesh(self.mesh, pp_microbatches=pp_microbatches)
        self.writer = Writer(self.run_dir, use_wandb=bool(cfg.get("use_wandb")),
                             group=str(dict(cfg["train_dataset"]).get("name")),
                             name=run_name,
                             config=cfg.to_dict() if isinstance(cfg, Config) else dict(cfg))

        precision = dict(cfg.get("precision", {}))
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            precision.get("compute_dtype", "float32")]
        self.model = build_model(cfg["model"], dtype=dtype,
                                 remat=bool(precision.get("remat", False)))

        (self.train_dataloader, self.test_dataloader,
         self.processor) = get_dataloaders(cfg)

        # Initialize variables on a real (test-partition) batch.
        init_batch, _ = split_batch(next(iter(self.test_dataloader)))
        self.key, init_key = jax.random.split(self.key)
        # jitted init: one compiled program instead of per-op dispatch
        variables = jax.jit(
            lambda k: self.model.init(k, init_batch, deterministic=True)
        )(init_key)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        self.params = variables["params"]
        self.extra_vars = {k: v for k, v in variables.items() if k != "params"}
        self.has_batch_stats = "batch_stats" in self.extra_vars
        self._maybe_load_t5_weights()

        self._place_params()
        self.metrics = Metrics(dict(cfg["metrics"]))
        self.epoch = 0
        self.global_step = 0
        # mid-epoch resume bookkeeping: steps applied within the current
        # epoch and the in-flight train-step PRNG key (state[3]); both ride
        # in every checkpoint so an interrupt anywhere resumes exactly
        self._step_in_epoch = 0
        self._loop_key = None
        self._resume_step_in_epoch = 0
        self._resume_loop_key = None
        self._terminate = False
        self.preempted = False
        self._profiling = False
        self._async_ckpt = None
        self.tx = None
        self.opt_state = None
        self.schedule = None
        self._train_step = None
        self._eval_step = parallel.make_eval_step(
            self.model, has_batch_stats=self.has_batch_stats)
        self._decode = jax.jit(
            lambda out, batch: decode_action(
                out, batch, is_bimanual=self.model.is_bimanual,
                constrain_pick_mask=getattr(self.model, "constrain_pick_mask", True),
                threshold=float(self.model.threshold)))

        n_params = sum(x.size for x in jax.tree_util.tree_leaves(self.params))
        print(f"[trainer] model={dict(cfg['model'])['name']} params={n_params / 1e6:.1f}M "
              f"mesh={dict(self.mesh.shape)} devices={len(jax.devices())}")

    # ------------------------------------------------------------------

    def _maybe_load_t5_weights(self) -> None:
        """T5-branch from_pretrained semantics (text_unet.py:56-59): when
        ``model.text_encoder`` is a local HF checkpoint DIRECTORY that also
        carries weights, graft them into the freshly-initialized
        ``text_encoder`` subtree. A config.json-only dir (random init, for
        smokes/tests) is left alone; CLIP names never reach here."""
        enc = dict(self.cfg["model"]).get("text_encoder")
        if ("text_encoder" not in self.params or not enc
                or not Path(str(enc)).is_dir()):
            return
        d = Path(str(enc))
        if not any((d / n).exists()
                   for n in ("model.safetensors", "pytorch_model.bin",
                             "model.safetensors.index.json",
                             "pytorch_model.bin.index.json")):
            return
        from bifold_tpu.models.convert import convert_t5, graft, load_state_dict
        converted = convert_t5(load_state_dict(d))
        self.params = graft(self.params, "text_encoder", converted)
        print(f"[trainer] loaded pretrained T5 text encoder from {d}")

    def _place_params(self) -> None:
        shardings = parallel.param_sharding(self.mesh, self.params)
        self.params = jax.device_put(self.params, shardings)
        if self.extra_vars:
            self.extra_vars = jax.device_put(
                self.extra_vars, parallel.param_sharding(self.mesh, self.extra_vars))

    def prepare_train(self) -> None:
        """Loss/optimizer/scheduler + resume (reference __main__.py:112-122)."""
        cfg = self.cfg
        self.loss_fn = build_loss(dict(cfg["loss"]))
        max_iters = max(1, len(self.train_dataloader) * int(cfg["epochs"]))
        lora = bool(dict(cfg["model"]).get("lora", False))
        mask = trainable_mask(self.params, lora=lora)
        # frozen towers in compute dtype (see conf/config.yaml precast_frozen)
        self._tmask = mask
        self._precast = bool(cfg.get("precast_frozen", True))
        if self._precast:
            self.params = precast_frozen(
                self.params, mask, getattr(self.model, "dtype", None))
        sched_cfg = dict(cfg["scheduler"]) if cfg.get("scheduler") else None
        self.tx, self.schedule = build_optimizer(
            dict(cfg["optim"]), sched_cfg, max_iters=max_iters, trainable=mask,
            gradient_clip=cfg.get("gradient_clip"))
        self.opt_state = self.tx.init(self.params)
        self.opt_state = jax.device_put(
            self.opt_state, parallel.param_sharding(self.mesh, self.opt_state))
        moe_aux = (float(getattr(self.model, "moe_aux_weight", 0.0))
                   if int(getattr(self.model, "moe_experts", 0) or 0) else 0.0)
        donate = bool(self.cfg.get("donate_state", True))
        self._train_step = parallel.make_train_step(
            self.model, self.loss_fn, self.tx,
            has_batch_stats=self.has_batch_stats,
            donate=donate,
            trainable=mask, moe_aux_weight=moe_aux)
        # steps_per_dispatch > 1: fuse k steps into one lax.scan program
        # (parallel.make_scan_train_step) — amortizes per-program launch +
        # per-step host sync k-ways; numerics are bit-identical to k
        # dispatched steps (tested). Preemption/save_steps granularity
        # coarsens to k steps; epoch tails (< k batches) run per-step.
        self._scan_steps = max(1, int(cfg.get("steps_per_dispatch") or 1))
        self._multi_step = (parallel.make_scan_train_step(
            self._train_step, self._scan_steps, donate=donate)
            if self._scan_steps > 1 else None)
        self.load_model(prefer="last")

    # ------------------------------------------------------------------
    # Checkpointing (reference __main__.py:272-325)
    # ------------------------------------------------------------------

    @property
    def ckpt_dir(self) -> Path:
        return self.run_dir / "checkpoints"

    def _host_rng_generators(self) -> Dict[str, Any]:
        """Named np.random.Generator instances whose streams must survive a
        resume (loader shuffle order, processor augmentation draws)."""
        gens, seen = {}, set()
        for name, obj in (("train_loader", self.train_dataloader),
                          ("test_loader", self.test_dataloader),
                          ("processor", self.processor),
                          ("train_processor",
                           getattr(self.train_dataloader, "processor", None)),
                          ("test_processor",
                           getattr(self.test_dataloader, "processor", None))):
            gen = getattr(obj, "_rng", None)
            if gen is not None and id(gen) not in seen:
                seen.add(id(gen))
                gens[name] = gen
        return gens

    def save_model(self, name: str) -> None:
        # async_checkpoint=true moves the pickle+write off the critical path
        # (the host fetch still runs inline — donation safety); single-
        # process only: the collective gathers inside must stay on the main
        # thread in program order across hosts
        use_async = bool(self.cfg.get("async_checkpoint", False)) \
            and jax.process_count() == 1
        if use_async:
            if self._async_ckpt is None:
                self._async_ckpt = AsyncCheckpointer()
            saver = self._async_ckpt.save
        else:
            if self._async_ckpt is not None:
                self._async_ckpt.wait()
            saver = save_checkpoint
        saver(
            self.ckpt_dir / f"{name}.ckpt",
            params=self.params, opt_state=self.opt_state,
            extra_vars=self.extra_vars, epoch=self.epoch,
            step=self.global_step, best_eval=self.metrics.best_eval,
            step_in_epoch=self._step_in_epoch, loop_key=self._loop_key,
            jax_key=self.key,
            host_rng_states={k: g.bit_generator.state
                             for k, g in self._host_rng_generators().items()},
            metadata={"model": dict(self.cfg["model"]),
                      "tracked_metric": self.metrics.tracked_metric})

    def load_model(self, prefer: str = "last", path: Optional[Path] = None) -> bool:
        if self._async_ckpt is not None:
            self._async_ckpt.wait()     # the file we read must be complete
        path = path or latest_checkpoint(self.ckpt_dir, prefer=prefer)
        if path is None:
            return False
        payload = load_checkpoint(path)
        self.params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
        if payload.get("extra_vars"):
            self.extra_vars = jax.tree_util.tree_map(
                jnp.asarray, payload["extra_vars"])
        self._place_params()
        if getattr(self, "_precast", False):
            # restoring an f32 checkpoint into a precast trainer: re-apply
            # so the compiled step signature (and HBM traffic) is stable
            self.params = precast_frozen(
                self.params, self._tmask, getattr(self.model, "dtype", None))
        else:
            # the opt-out flag cannot UN-round: a checkpoint written under
            # precast_frozen=true stores frozen towers already bf16-rounded,
            # and the f32 masters are gone. Warn so a silent dtype mismatch
            # (ADVICE r4) never masquerades as f32-master behavior.
            low = [jax.tree_util.keystr(p)
                   for p, v in jax.tree_util.tree_leaves_with_path(self.params)
                   if hasattr(v, "dtype") and v.dtype == jnp.bfloat16]
            if low:
                import warnings
                warnings.warn(
                    f"precast_frozen=false but {len(low)} restored leaves are "
                    f"bfloat16 (checkpoint was saved under precast_frozen="
                    f"true; f32 masters are unrecoverable), e.g. {low[0]}",
                    stacklevel=2)
        if payload.get("opt_state") is not None and self.tx is not None:
            # dtype template only — eval_shape gives the same structure and
            # leaf dtypes WITHOUT materializing a full Adam mu/nu tree
            # (~2x trainable-param bytes) just to throw it away
            ref = jax.eval_shape(self.tx.init, self.params)
            restored = jax.tree_util.tree_map(
                lambda r, s: jnp.asarray(s).astype(r.dtype) if hasattr(r, "dtype") else s,
                ref, payload["opt_state"])
            self.opt_state = jax.device_put(
                restored, parallel.param_sharding(self.mesh, self.opt_state or restored))
        self.epoch = int(payload.get("epoch", 0))
        self.global_step = int(payload.get("step", 0))
        self.metrics.best_eval = payload.get("best_eval")
        if payload.get("jax_key") is not None:
            self.key = payload["jax_key"]
        # mid-epoch checkpoint: train_epoch will restart this epoch's
        # index-derived batch stream at the saved offset and continue the
        # saved key chain instead of splitting a fresh one
        self._resume_step_in_epoch = int(payload.get("step_in_epoch", 0) or 0)
        self._resume_loop_key = payload.get("loop_key")
        saved_states = payload.get("host_rng_states") or {}
        for k, gen in self._host_rng_generators().items():
            if k in saved_states:
                gen.bit_generator.state = saved_states[k]
        print(f"[trainer] resumed from {path} (epoch {self.epoch})")
        return True

    # ------------------------------------------------------------------
    # Training loop (reference __main__.py:68-163)
    # ------------------------------------------------------------------

    def train(self) -> None:
        cfg = self.cfg
        eval_epochs = int(cfg.get("eval_epochs") or 0)
        save_epochs = cfg.get("save_epochs")
        # graceful preemption: managed TPU VMs send SIGTERM ahead of the
        # kill; convert it into a step-boundary checkpoint + clean exit.
        # Signals only deliver to the main thread — elsewhere (tests,
        # embedding apps) the flag can be set directly on the trainer.
        import signal
        import threading
        # _terminate is consume-on-preempt (cleared where it is honored, in
        # the except below), NOT cleared here: a watchdog thread setting the
        # flag just before train() enters must still preempt promptly. Only
        # the output flag resets per call.
        self.preempted = False
        installed = False
        prev_handler = None

        def _on_term(signum, frame):
            self._terminate = True
            print("[trainer] SIGTERM: checkpointing at the next step "
                  "boundary", flush=True)

        if threading.current_thread() is threading.main_thread():
            prev_handler = signal.signal(signal.SIGTERM, _on_term)
            installed = True
        try:
            for epoch in range(self.epoch, int(cfg["epochs"])):
                self.epoch = epoch
                self.train_epoch()
                # the epoch is complete: checkpoints written from here on
                # (eval best, periodic last) must resume AFTER it, not replay
                self.epoch = epoch + 1
                if self._terminate:   # notice landed on the last step
                    raise Preempted()
                if eval_epochs and (epoch + 1) % eval_epochs == 0:
                    has_improved, metric_dict = self.eval_epoch(epoch)
                    self.writer.log({f"eval/{k}": v for k, v in metric_dict.items()},
                                    self.global_step)
                    if has_improved:
                        self.save_model("best")
                    if self._terminate:   # notice landed DURING the eval —
                        raise Preempted()  # don't silently swallow it
                if save_epochs and (epoch + 1) % int(save_epochs) == 0:
                    self.save_model("last")
        except Preempted:
            self.preempted = True
            self._terminate = False   # consumed — a later train() resumes
            self.save_model("last")
            print(f"[trainer] preempted at epoch {self.epoch} step "
                  f"{self._step_in_epoch}; saved step-granular last.ckpt — "
                  f"the next run resumes mid-epoch", flush=True)
            if self._async_ckpt is not None:
                self._async_ckpt.wait()
            return
        except (KeyboardInterrupt, Exception):
            # crash-resume is the recovery path (reference auto-resumes from
            # last.pth, __main__.py:272-302): persist progress before dying.
            # A failed save (e.g. the interrupt landed inside the donated step
            # dispatch) must not mask the original exception.
            try:
                self.save_model("last")
                print(f"[trainer] interrupted at epoch {self.epoch}; "
                      f"saved checkpoints/last.ckpt for resume")
            except Exception as save_err:  # noqa: BLE001
                print(f"[trainer] interrupt checkpoint failed: {save_err!r}")
            raise
        finally:
            # a trace left open by an interrupted epoch 0 would keep
            # recording (and buffering) the rest of the process lifetime
            self._stop_profiler()
            # restore-by-installed (NOT by prev_handler value: signal()
            # returns None for handlers installed from C, and leaking
            # _on_term would make the process un-terminatable)
            if installed:
                signal.signal(signal.SIGTERM,
                              prev_handler if prev_handler is not None
                              else signal.SIG_DFL)
        self.epoch = int(cfg["epochs"])
        if self._terminate:
            # the (single) notice landed after the last step — training IS
            # complete, but callers must still skip post-training work and
            # exit promptly
            self._terminate = False
            self.preempted = True
        self.save_model("last")
        if self._async_ckpt is not None:
            self._async_ckpt.wait()     # surface write errors before returning

    def _stop_profiler(self) -> None:
        """Idempotent jax.profiler stop — called at the profile_steps
        threshold, at epoch-0 end, and from train()'s finally, so a trace
        started for a short or interrupted first epoch never keeps
        recording (and buffering) the rest of the run."""
        if self._profiling:
            self._profiling = False
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # noqa: BLE001 — best-effort cleanup
                print(f"[trainer] profiler stop failed: {e!r}")

    def train_epoch(self) -> float:
        # log_every=0 disables step logging (epoch summaries still emit)
        log_every = int(self.cfg.get("log_every", 50) or 0)
        save_steps = int(self.cfg.get("save_steps") or 0)
        running, n_steps = 0.0, 0
        t_epoch = time.time()
        samples = 0
        profile_steps = int(self.cfg.get("profile_steps") or 0)
        if profile_steps and self.epoch == 0 and not self._profiling:
            # tracing hook (SURVEY.md §5: the reference has none; we expose
            # jax.profiler so the step can be inspected in xprof/tensorboard)
            jax.profiler.start_trace(str(self.run_dir / "profile"))
            self._profiling = True
        if hasattr(self.train_dataloader, "set_epoch"):
            self.train_dataloader.set_epoch(self.epoch)
        start = 0
        if self._resume_step_in_epoch and self._resume_loop_key is not None:
            # mid-epoch resume: same epoch permutation (index-derived), skip
            # the already-applied batches, continue the in-flight key chain
            # (self.key was already split past this epoch at its first start)
            start = self._resume_step_in_epoch
            loop_key = self._resume_loop_key
            self.train_dataloader.start_batch = start
            print(f"[trainer] resuming epoch {self.epoch} at step {start}")
        else:
            self.key, loop_key = jax.random.split(self.key)
        self._resume_step_in_epoch, self._resume_loop_key = 0, None
        self._step_in_epoch = start
        state = (self.params, self.opt_state, self.extra_vars, loop_key)
        checked_grads = not bool(self.cfg.get("debug"))
        k_scan = self._scan_steps if getattr(self, "_multi_step", None) else 1
        readback_window = max(0, int(self.cfg.get("loss_readback_window",
                                                  2) or 0))
        pending = []   # deferred (loss_mean future, n_steps) readbacks

        def batch_groups():
            """Yield lists of k_scan consecutive batches (ONE fused scan
            dispatch each); the epoch tail (< k batches) yields SINGLETONS.
            Tail batches run through the per-step program either way — but
            they must be separate groups, not one multi-batch group: the
            per-group bookkeeping below (live param handles, global_step,
            save_steps boundaries) runs once per group, and a multi-batch
            group would leave self.params pointing at buffers the first
            tail step's donation already deleted — an interrupt between
            tail steps then cannot checkpoint (loses up to an epoch), and
            a save_steps boundary inside the tail never fires.

            When the loader is sized (the shipped loaders all are), the
            tail is known up front and its batches yield as soon as they
            are pulled — buffering the tail eagerly would run the loader
            (and any SIGTERM delivered during it) to exhaustion before the
            first tail step, preempting earlier than the step boundary the
            SIGTERM contract promises (test_sigterm_preemption_*)."""
            try:
                remaining = max(0, len(self.train_dataloader) - start)
            except TypeError:
                remaining = None    # unsized iterable: buffered fallback
            in_full_groups = (remaining // k_scan) * k_scan \
                if remaining is not None else None
            buf, pulled, buf_shapes = [], 0, None
            for b in self.train_dataloader:
                pulled += 1
                if in_full_groups is not None and pulled > in_full_groups:
                    yield [b]       # known tail: step immediately
                    continue
                # groups are np.stack'ed: a ragged batch (drop_last=False
                # loaders can emit a smaller final batch that still lands
                # INSIDE a full k-group) must not share a group with
                # full-size batches — route shape-mismatched batches (and
                # whatever was buffered) as singletons instead of crashing
                # the stack mid-epoch
                shapes = tuple(np.shape(x)
                               for x in jax.tree_util.tree_leaves(b))
                if buf and shapes != buf_shapes:
                    for x in buf:
                        yield [x]
                    buf = []
                buf_shapes = shapes
                buf.append(b)
                if len(buf) == k_scan:
                    yield buf
                    buf = []
            for b in buf:           # unsized-iterable tail
                yield [b]

        for group in batch_groups():
            host_batches = [split_batch(b)[0] for b in group]
            fused = len(group) == k_scan and k_scan > 1
            if fused:
                # ONE stack + ONE sharded placement + ONE dispatch for k
                # steps (make_scan_train_step). The loader's jitted
                # processor leaves batches ON DEVICE — when they are
                # (single-process), stack there with one jitted program:
                # np.stack would pull every processed batch back to host
                # first, k downloads + a full re-upload per group, which on
                # a tunneled runtime (~25 MB/s) costs seconds per dispatch
                # and silently made the k=8 default ~8x SLOWER than k=1 in
                # the real CLI loop (bench.py never exercises this path —
                # it broadcasts one device batch). Multi-process feeding
                # keeps the host path: make_array_from_process_local_data
                # needs per-process host slices.
                if jax.process_count() == 1 and all(
                        isinstance(x, jax.Array)
                        for hb in host_batches
                        for x in jax.tree_util.tree_leaves(hb)):
                    stacked = _stack_batches_on_device(*host_batches)
                else:
                    stacked = jax.tree_util.tree_map(
                        lambda *xs: np.stack(xs), *host_batches)
                device_batch = parallel.shard_batch(self.mesh, stacked,
                                                    stacked=True)
            else:
                device_batch = parallel.shard_batch(self.mesh, host_batches[0])
            if not checked_grads:
                single = (device_batch if not fused else
                          parallel.shard_batch(self.mesh, host_batches[0]))
                self._debug_check_gradients(state, single)
                checked_grads = True
            if self.cfg.get("visualize_model_inputs") and self.global_step == 0:
                self._visualize_model_inputs(group[0])
            t0 = time.time()
            if fused:
                state, step_metrics = self._multi_step(state, device_batch)
            else:
                # k_scan == 1 or an epoch-tail singleton: per-step program
                state, step_metrics = self._train_step(state, device_batch)
            n_done = len(group)
            # The donated step invalidates the previous state's buffers; keep
            # live handles every step so the interrupt path (train()'s except
            # -> save_model) never reads deleted arrays mid-epoch.
            self.params, self.opt_state, self.extra_vars, self._loop_key = state
            # Deferred loss readback: float(loss) every step blocks the host
            # until that step FINISHES — a full round-trip serialized into
            # every step (measured +26-31 ms/step over this tunnel; a
            # per-step sync would cost real time on any host). Keep a
            # readback_window-deep queue of loss futures instead, so up to W
            # steps stay in flight and the device never idles between
            # dispatches; log/save boundaries drain it (a natural sync).
            pending.append((step_metrics.get("loss_mean",
                                             step_metrics["loss"]), n_done))
            while len(pending) > readback_window:
                a, nd = pending.pop(0)
                running += float(a) * nd
            n_steps += n_done
            # host_batches hold this PROCESS's slice; the device batch is
            # global, so scale by process_count for an honest samples/sec.
            samples += int(host_batches[0][next(
                kk for kk, vv in host_batches[0].items()
                if hasattr(vv, "shape"))].shape[0]) * n_done \
                * jax.process_count()
            prev_global = self.global_step
            self.global_step += n_done
            self._step_in_epoch = start + n_steps
            if self._terminate:
                raise Preempted()
            if save_steps and (self.global_step // save_steps
                               > prev_global // save_steps):
                self.save_model("last")
            if self._profiling and n_steps >= profile_steps:
                jax.block_until_ready(step_metrics["loss"])
                self._stop_profiler()
            if log_every and (self.global_step // log_every
                              > prev_global // log_every):
                while pending:           # sync point — bring running current
                    a, nd = pending.pop(0)
                    running += float(a) * nd
                lr = float(self.schedule(self.global_step)) if self.schedule else None
                self.writer.log(
                    {"train/loss": float(step_metrics["loss"]),
                     **{f"train/{k}": float(v) for k, v in step_metrics.items()
                        if k != "loss"},
                     "train/lr": lr,
                     "train/step_time_s": (time.time() - t0) / n_done},
                    self.global_step)
        while pending:
            a, nd = pending.pop(0)
            running += float(a) * nd
        if self._profiling:
            # epoch 0 ended before profile_steps steps: close the trace over
            # the short epoch instead of silently recording the whole run
            jax.block_until_ready(jax.tree_util.tree_leaves(state))
            self._stop_profiler()
        self.params, self.opt_state, self.extra_vars, _ = state
        # epoch complete: subsequent checkpoints are epoch-boundary ones
        # (resume restarts the next epoch's key chain from self.key)
        self._step_in_epoch = 0
        self._loop_key = None
        dt = time.time() - t_epoch
        mean_loss = running / max(n_steps, 1)
        throughput = samples / dt if dt > 0 else 0.0
        self.writer.log({"train/epoch": self.epoch, "train/mean_loss": mean_loss,
                         "train/samples_per_sec": throughput}, self.global_step)
        print(f"[epoch {self.epoch}] loss={mean_loss:.4f} "
              f"({throughput:.1f} samples/s)")
        return mean_loss

    def _visualize_model_inputs(self, batch) -> None:
        """Dump the first train batch's inputs + targets for inspection
        (reference __main__.py:132-133,334-394)."""
        from bifold_tpu.utils.visualization import save_predictions
        out = str(self.run_dir / "input_viz")
        raw_rgb = np.asarray(batch.get("raw_rgb"))
        depth = np.asarray(batch.get("depth")) if "depth" in batch else None
        for j in range(min(len(raw_rgb), 4)):
            heatmaps = {k: np.asarray(v)[j] for k, v in batch.items()
                        if k.endswith("_heatmap") and not isinstance(v, list)}
            save_predictions(
                out, f"{j}.png", rgb=raw_rgb[j],
                depth=depth[j] if depth is not None else None, **heatmaps)

    def _debug_check_gradients(self, state, device_batch) -> None:
        """Debug-mode invariant: every trainable parameter receives a nonzero
        gradient on the first step (reference __main__.py:143-146)."""
        params = state[0]
        lora = bool(dict(self.cfg["model"]).get("lora", False))
        mask = trainable_mask(params, lora=lora)

        @jax.jit
        def grads_of(p, batch, key):
            def loss_of(pp):
                out = self.model.apply({"params": pp, **self.extra_vars},
                                       batch, deterministic=False,
                                       rngs={"dropout": key})
                return self.loss_fn(out, batch)[0]
            return jax.grad(loss_of)(p)

        grads = grads_of(params, device_batch, jax.random.key(0))
        flat_g = jax.tree_util.tree_flatten_with_path(grads)[0]
        flat_m = jax.tree_util.tree_leaves(mask)
        dead = [jax.tree_util.keystr(path)
                for (path, g), trainable in zip(flat_g, flat_m)
                if trainable and float(jnp.abs(g).max()) == 0.0]
        # lora_a has zero gradient at init by construction (lora_b starts at
        # 0, peft semantics) — it wakes up once lora_b moves
        dead = [d for d in dead if "lora_a" not in d]
        if dead:
            print(f"[debug] WARNING: {len(dead)} trainable params got zero "
                  f"gradient, e.g. {dead[:5]}")
        else:
            print("[debug] all trainable params received gradients "
                  "(lora_a excluded: zero at init by construction)")

    # ------------------------------------------------------------------
    # Evaluation (reference __main__.py:82-104,165-270)
    # ------------------------------------------------------------------

    def get_action(self, batch: Dict[str, Any], return_raw_output: bool = False):
        """No-grad forward + jitted decode -> Action
        (reference models/__init__.py:79-173)."""
        device_batch, _ = split_batch(batch)
        out = self._eval_step(self.params, self.extra_vars, device_batch)
        decoded = jax.tree_util.tree_map(np.asarray,
                                         self._decode(out, device_batch))
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

    def eval_epoch(self, epoch: Optional[int] = None):
        """Pixel metrics during training; simulator eval when configured and
        called at the end (epoch None), reference __main__.py:165-187."""
        if epoch is None and self.cfg.get("simulator") == "softgym" \
                and self._softgym_available():
            return self.eval_epoch_softgym()
        return self.eval_epoch_pixel()

    def eval_epoch_pixel(self):
        self.metrics.reset()
        visualize = bool(self.cfg.get("visualize_predictions"))
        for batch_idx, batch in enumerate(self.test_dataloader):
            action, raw_output = self.get_action(batch, return_raw_output=True)
            sample = {k: np.asarray(v) if not isinstance(v, (list, tuple)) else v
                      for k, v in batch.items()}
            self.metrics(action=action, sample=sample, raw_output=raw_output)
            if visualize:
                self._visualize_predictions(sample, action, raw_output, batch_idx)
        return self.metrics.summary()

    def _visualize_predictions(self, sample, action, raw_output, batch_idx):
        """Arrow overlays + heatmap blends per eval batch
        (reference __main__.py:204-236 / utils/visualization.py)."""
        from bifold_tpu.utils.visualization import save_predictions, visualize_action
        out = str(self.run_dir / "eval_viz")
        for j, img in enumerate(visualize_action(sample, action)):
            heatmaps = {k: np.asarray(v)[j] for k, v in raw_output.items()
                        if k.endswith("_heatmap")}
            save_predictions(out, f"{batch_idx:04d}_{j}.png",
                             rgb=np.asarray(sample["raw_rgb"])[j], viz=img,
                             **heatmaps)

    def _softgym_available(self) -> bool:
        try:
            from bifold_tpu.env import softgym_evaluator  # noqa: F401,WPS433
            return True
        except ImportError:
            return False

    def eval_epoch_softgym(self):
        from bifold_tpu.env.softgym_evaluator import run_softgym_eval  # noqa: WPS433
        return run_softgym_eval(self)

    def eval(self) -> Dict[str, float]:
        """Final eval: load best (or last), run, merge into eval_<name>.yaml
        (reference __main__.py:82-104)."""
        prefer = "best" if self.cfg.get("load_best") else "last"
        self.load_model(prefer=prefer)
        _, metric_dict = self.eval_epoch(None)
        ds_name = dict(self.cfg["test_dataset"]).get("name") or \
            dict(self.cfg["train_dataset"]).get("name")
        out_path = self.run_dir / f"eval_{ds_name}.yaml"
        old: Dict[str, Any] = {}
        if out_path.exists():
            old = yaml.safe_load(out_path.read_text()) or {}
            for k, v in metric_dict.items():
                if k in old and old[k] is not None:
                    print(f"[eval] {k}: {old[k]} -> {v}")
        old.update({k: (None if v is None or (isinstance(v, float) and np.isnan(v))
                        else float(v)) for k, v in metric_dict.items()})
        out_path.write_text(yaml.safe_dump(old, sort_keys=False))
        print(f"[eval] {metric_dict}")
        return metric_dict

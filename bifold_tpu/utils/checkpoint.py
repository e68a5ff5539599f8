"""Checkpoint store: params + opt state + RNG states + trainer bookkeeping.

Counterpart of the reference's ``save_model``/``load_model``
(/root/reference/bifold/__main__.py:272-325), which pickles model/optimizer/
scheduler state plus **all host RNG states** so training resumes bitwise.
Here the same contract holds for the JAX stack: params/opt-state pytrees
(host-fetched), the jax PRNG key, numpy and python RNG states, epoch and
best-metric value. ``last.ckpt`` / ``best.ckpt`` naming mirrors
``last.pth``/``best.pth``.

ELASTIC-RESUME GUARANTEE: every array is stored as a fully-gathered host
numpy array — no mesh topology, device count, or sharding layout is baked
into the file. A run checkpointed under one mesh resumes under ANY other
(different axis layout, device count, or ``steps_per_dispatch``) with the
same training trajectory up to cross-topology float-order noise; proven by
tests/test_elastic_resume.py (dp=2 x fsdp=2 x tp=2 -> dp=8 / single device /
steps_per_dispatch 1 -> 3, SGD trajectories equal to the uninterrupted run).
"""

from __future__ import annotations

import pickle
import random
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint",
           "AsyncCheckpointer"]


def _to_host(tree: Any, copy: bool = False) -> Any:
    """Fetch a pytree to host numpy.

    Multi-process arrays (fsdp-sharded across hosts: not fully addressable)
    are gathered collectively — EVERY process must call this (it runs an
    all-gather), even though only process 0 writes the file.

    ``copy=True`` forces an owned snapshot: on the CPU backend a jax.Array
    can alias its donor numpy buffer, so the ASYNC writer must not share
    memory with arrays the caller may mutate. The sync path skips the extra
    memcpy (the write completes before any buffer can be reused)."""
    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        if isinstance(x, jax.Array):
            return np.array(x) if copy else np.asarray(x)
        return x

    return jax.tree_util.tree_map(fetch, tree)


def save_checkpoint(path: str | Path, *, params: Any, opt_state: Any = None,
                    extra_vars: Any = None, epoch: int = 0,
                    best_eval: Optional[float] = None,
                    jax_key: Optional[jax.Array] = None,
                    step: int = 0, step_in_epoch: int = 0,
                    loop_key: Optional[jax.Array] = None,
                    metadata: Optional[Dict] = None,
                    host_rng_states: Optional[Dict[str, Any]] = None) -> Path:
    """Write an atomic checkpoint (tmp + rename).

    ``host_rng_states`` carries named ``np.random.Generator`` states (loader
    shuffle, processor augmentation) so data order and augmentation streams
    resume bitwise too, not just the global RNGs. ``step_in_epoch`` +
    ``loop_key`` (the in-flight epoch PRNG key from the train-step state)
    make MID-epoch checkpoints exactly resumable: the Trainer restarts the
    epoch's index-derived batch stream at that offset and continues the
    dropout key chain instead of re-splitting.
    """
    payload = _build_payload(
        params=params, opt_state=opt_state, extra_vars=extra_vars,
        epoch=epoch, best_eval=best_eval, jax_key=jax_key, step=step,
        step_in_epoch=step_in_epoch, loop_key=loop_key,
        metadata=metadata, host_rng_states=host_rng_states)
    return _write_payload(Path(path), payload)


def _build_payload(*, params, opt_state=None, extra_vars=None, epoch=0,
                   best_eval=None, jax_key=None, step=0, step_in_epoch=0,
                   loop_key=None, metadata=None,
                   host_rng_states=None, copy=False) -> Dict:
    """Synchronous half: host-fetch every pytree (runs the multi-process
    collective gathers in main-thread program order; REQUIRED before a
    donated train step can reuse the buffers) and snapshot the RNG states
    at this instant. Defaults mirror save_checkpoint so both savers accept
    the same call."""
    return {
        "params": _to_host(params, copy=copy),
        "opt_state": _to_host(opt_state, copy=copy),
        "extra_vars": _to_host(extra_vars, copy=copy),
        "epoch": epoch,
        "step": step,
        "step_in_epoch": int(step_in_epoch),
        "best_eval": best_eval,
        "np_rng_state": np.random.get_state(),
        "py_rng_state": random.getstate(),
        "host_rng_states": host_rng_states or {},
        "jax_key": None if jax_key is None else np.asarray(jax.random.key_data(jax_key)),
        "loop_key": None if loop_key is None else np.asarray(jax.random.key_data(loop_key)),
        "metadata": metadata or {},
    }


def _write_payload(path: Path, payload: Dict) -> Path:
    """IO half: atomic pickle (tmp + rename); process 0 owns the file."""
    if jax.process_index() != 0:
        # the collective gathers in _build_payload already ran on every
        # process (all hosts see the same global values)
        return path
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)
    return path


class AsyncCheckpointer:
    """Checkpoint writes off the training critical path.

    ``save()`` runs the synchronous half inline — host fetch of the pytrees
    (the buffers may be donated away by the very next train step, and any
    multi-process collective gathers must run on the main thread in program
    order) plus the RNG snapshot — then serializes and atomically writes in
    a daemon thread. At most one write is in flight: a new ``save`` (or
    ``wait``) joins the previous one first and re-raises its error, so a
    failed write cannot be silently lost. Call ``wait()`` before reading
    the file back (resume, load_best) and at shutdown.
    """

    def __init__(self):
        self._thread = None
        self._error: Optional[BaseException] = None

    def save(self, path: str | Path, **kwargs) -> Path:
        import threading

        self.wait()
        path = Path(path)
        # forward **kwargs verbatim: an unknown field is a TypeError here,
        # not a silently-dropped checkpoint entry (keeps the sync and async
        # savers in lockstep); copy=True isolates the writer's snapshot
        payload = _build_payload(copy=True, **kwargs)

        def write():
            try:
                _write_payload(path, payload)
            except BaseException as e:  # noqa: BLE001 — surfaced on wait()
                self._error = e

        self._thread = threading.Thread(target=write, daemon=True,
                                        name="bifold-ckpt-writer")
        self._thread.start()
        return path

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from err


# whether $BIFOLD_SIGLIP_SPM currently holds a value load_checkpoint itself
# registered (vs one the user set, which always wins)
_SPM_ENV_OWNED = False


def load_checkpoint(path: str | Path, *, restore_rng: bool = True) -> Dict[str, Any]:
    """Load a checkpoint; optionally restore host RNG states in place
    (the reference restores random/np RNGs on resume, __main__.py:283-301).

    Tokenizer-asset pickup: a ``spiece.model`` sitting next to the
    checkpoint (models/convert.py copies it out of the source HF dir) is
    registered via ``$BIFOLD_SIGLIP_SPM`` so the from-scratch sentencepiece
    tokenizer (data/tokenizers.SpmSiglipTokenizer) tokenizes converted
    checkpoints with exact pretrained-vocabulary ids instead of the hash
    fallback. A user-set value wins; values WE registered are last-wins, so
    a long-lived process loading checkpoint A then B picks up B's asset for
    tokenizers built after the load (serving threads the sibling explicitly
    and does not depend on this)."""
    import os
    global _SPM_ENV_OWNED
    spm_sibling = Path(path).parent / "spiece.model"
    if spm_sibling.exists():
        if "BIFOLD_SIGLIP_SPM" not in os.environ or _SPM_ENV_OWNED:
            os.environ["BIFOLD_SIGLIP_SPM"] = str(spm_sibling)
            _SPM_ENV_OWNED = True
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if restore_rng:
        if payload.get("np_rng_state") is not None:
            np.random.set_state(payload["np_rng_state"])
        if payload.get("py_rng_state") is not None:
            random.setstate(payload["py_rng_state"])
    if payload.get("jax_key") is not None:
        payload["jax_key"] = jax.random.wrap_key_data(
            jax.numpy.asarray(payload["jax_key"]))
    if payload.get("loop_key") is not None:
        payload["loop_key"] = jax.random.wrap_key_data(
            jax.numpy.asarray(payload["loop_key"]))
    return payload


def latest_checkpoint(ckpt_dir: str | Path, prefer: str = "last") -> Optional[Path]:
    ckpt_dir = Path(ckpt_dir)
    for name in (f"{prefer}.ckpt", "last.ckpt", "best.ckpt"):
        p = ckpt_dir / name
        if p.exists():
            return p
    return None

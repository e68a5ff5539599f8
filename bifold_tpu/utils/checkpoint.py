"""Checkpoint store: params + opt state + RNG states + trainer bookkeeping.

Counterpart of the reference's ``save_model``/``load_model``
(/root/reference/bifold/__main__.py:272-325), which pickles model/optimizer/
scheduler state plus **all host RNG states** so training resumes bitwise.
Here the same contract holds for the JAX stack: params/opt-state pytrees
(host-fetched), the jax PRNG key, numpy and python RNG states, epoch and
best-metric value. ``last.ckpt`` / ``best.ckpt`` naming mirrors
``last.pth``/``best.pth``.
"""

from __future__ import annotations

import pickle
import random
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]


def _to_host(tree: Any) -> Any:
    """Fetch a pytree to host numpy.

    Multi-process arrays (fsdp-sharded across hosts: not fully addressable)
    are gathered collectively — EVERY process must call this (it runs an
    all-gather), even though only process 0 writes the file."""
    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x) if isinstance(x, jax.Array) else x

    return jax.tree_util.tree_map(fetch, tree)


def save_checkpoint(path: str | Path, *, params: Any, opt_state: Any = None,
                    extra_vars: Any = None, epoch: int = 0,
                    best_eval: Optional[float] = None,
                    jax_key: Optional[jax.Array] = None,
                    step: int = 0, metadata: Optional[Dict] = None,
                    host_rng_states: Optional[Dict[str, Any]] = None) -> Path:
    """Write an atomic checkpoint (tmp + rename).

    ``host_rng_states`` carries named ``np.random.Generator`` states (loader
    shuffle, processor augmentation) so data order and augmentation streams
    resume bitwise too, not just the global RNGs.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "params": _to_host(params),
        "opt_state": _to_host(opt_state),
        "extra_vars": _to_host(extra_vars),
        "epoch": epoch,
        "step": step,
        "best_eval": best_eval,
        "np_rng_state": np.random.get_state(),
        "py_rng_state": random.getstate(),
        "host_rng_states": host_rng_states or {},
        "jax_key": None if jax_key is None else np.asarray(jax.random.key_data(jax_key)),
        "metadata": metadata or {},
    }
    if jax.process_index() != 0:
        # the collective gathers above already ran on every process; only
        # process 0 owns the file (all hosts see the same global values)
        return path
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)
    return path


def load_checkpoint(path: str | Path, *, restore_rng: bool = True) -> Dict[str, Any]:
    """Load a checkpoint; optionally restore host RNG states in place
    (the reference restores random/np RNGs on resume, __main__.py:283-301)."""
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
    return payload


def latest_checkpoint(ckpt_dir: str | Path, prefer: str = "last") -> Optional[Path]:
    ckpt_dir = Path(ckpt_dir)
    for name in (f"{prefer}.ckpt", "last.ckpt", "best.ckpt"):
        p = ckpt_dir / name
        if p.exists():
            return p
    return None

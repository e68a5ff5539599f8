"""Mixture-of-Experts FFN with expert parallelism over an ``ep`` mesh axis.

The reference architecture has no MoE (its FFNs are dense,
/root/reference/bifold/models/modules.py:18-30) — like pipeline parallelism
(parallel/pipeline.py) and ring attention (ops/ring_attention.py), this is a
TPU-native capability addition: the verified primitive for scaling FFN
capacity past one chip, completing the dp/fsdp/tp/pp/sp/ep axis set.

Design (scaling-book expert-parallelism recipe, Switch/GShard-style static
routing — no data-dependent shapes anywhere, so the whole layer jits):

- **Router**: softmax over expert logits; top-k experts per token, chosen
  greedily (k small, unrolled). Per (expert, k) slot positions come from a
  cumsum over tokens in order (earlier tokens win capacity), and tokens past
  the expert's capacity ``C = ceil(T/E * capacity_factor * k)`` are DROPPED
  (contribute zero — the standard capacity-overflow semantics). Dispatch is
  a dense one-hot (T, E, C) mask consumed by einsums, which is exactly the
  MXU-friendly formulation: routing becomes three matmuls, not scatters.
- **Dense path** (``moe_ffn``): gather expert batches
  ``(E, C, D) = dispatch^T x``, apply each expert's 2-layer gelu FFN
  batched over E, and combine back with the gate-weighted mask — the
  single-device reference the parallel path is tested against.
- **Expert-parallel path** (``expert_parallel_ffn``): tokens shard over
  ``ep`` (composing with any outer dp sharding of the leading axes);
  experts shard over ``ep``. Each device routes its own token shard against
  ALL experts, then one ``lax.all_to_all`` ships the (E, C_local, D) expert
  batches to their owners — (E, C, D) split over E, concatenated over C —
  the local experts run on ``(E/ep, ep*C, D)``, and the reverse all_to_all
  brings each token's outputs home for the combine. Communication is
  2 x (T/ep)·D·k bytes per device over ICI, the canonical MoE all_to_all
  pattern (NOT a psum of full token outputs).

Capacity semantics under ep are per token-shard (each sender gets C_local
slots per expert); with a capacity factor generous enough that nothing
drops, the parallel output equals the dense reference exactly —
tests/test_moe.py asserts fwd and grads on the CPU mesh, and
__graft_entry__'s dryrun exercises a (dp, ep) mesh.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["init_moe_params", "moe_ffn", "expert_parallel_ffn", "route"]


def init_moe_params(key, dim: int, hidden: int, num_experts: int,
                    dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Router + per-expert 2-layer FFN parameters (normal(0.02) like the
    reference init_weights, models/utils.py:86-94)."""
    ks = jax.random.split(key, 3)
    init = lambda k, shape: (0.02 * jax.random.normal(k, shape)).astype(dtype)  # noqa: E731
    return {
        "router": init(ks[0], (dim, num_experts)),
        "w1": init(ks[1], (num_experts, dim, hidden)),
        "b1": jnp.zeros((num_experts, hidden), dtype),
        "w2": init(ks[2], (num_experts, hidden, dim)),
        "b2": jnp.zeros((num_experts, dim), dtype),
    }


def route(x, router, *, top_k: int, capacity: int, return_aux: bool = False):
    """Static-shape top-k capacity routing.

    Returns (dispatch (T, E, C) {0,1}, combine (T, E, C) gate-weighted);
    with ``return_aux`` also the Switch load-balance loss
    ``E * sum_e f_e * P_e`` (f_e = fraction of tokens whose FIRST choice is
    expert e, pre-capacity; P_e = mean router probability) — 1.0 at perfect
    balance, to be weighted into the train loss so the router cannot
    collapse onto a few experts. Greedy k passes; within each pass, slot
    order = token order (cumsum priority); overflow tokens get all-zero
    rows (dropped).
    """
    t, _ = x.shape
    logits = x.astype(jnp.float32) @ router.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)                     # (T, E)
    e = probs.shape[-1]
    aux = None
    if return_aux:
        first = jax.nn.one_hot(jnp.argmax(probs, axis=-1), e,
                               dtype=jnp.float32)               # (T, E)
        # f_e uses a straight count (no gradient path), P_e carries the
        # router gradient — the Switch formulation (arXiv 2101.03961 eq. 4)
        aux = e * jnp.sum(jnp.mean(jax.lax.stop_gradient(first), axis=0)
                          * jnp.mean(probs, axis=0))

    dispatch = jnp.zeros((t, e, capacity), jnp.float32)
    combine = jnp.zeros((t, e, capacity), jnp.float32)
    # slots already used per expert accumulate across the k passes
    used = jnp.zeros((e,), jnp.int32)
    masked = probs
    for _ in range(top_k):
        choice = jnp.argmax(masked, axis=-1)                    # (T,)
        onehot = jax.nn.one_hot(choice, e, dtype=jnp.float32)   # (T, E)
        gate = jnp.sum(masked * onehot, axis=-1)                # (T,)
        # position of each token within its chosen expert this pass
        pos = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot       # (T, E)
        pos_t = jnp.sum(pos, axis=-1).astype(jnp.int32) + \
            jnp.sum(onehot * used[None, :], axis=-1).astype(jnp.int32)
        keep = (pos_t < capacity).astype(jnp.float32)
        slot = jax.nn.one_hot(jnp.clip(pos_t, 0, capacity - 1), capacity,
                              dtype=jnp.float32)                # (T, C)
        d = onehot[:, :, None] * slot[:, None, :] * keep[:, None, None]
        dispatch = dispatch + d
        combine = combine + d * gate[:, None, None]
        used = used + jnp.sum(onehot * keep[:, None], axis=0).astype(jnp.int32)
        masked = masked * (1.0 - onehot)                        # next pass
    if return_aux:
        return dispatch, combine, aux
    return dispatch, combine


def _expert_ffn(expert_in, w1, b1, w2, b2):
    """(E, C, D) -> (E, C, D): per-expert fc1 -> gelu -> fc2, batched over
    E so the MXU sees (C, D)x(D, H) matmuls per expert."""
    h = jnp.einsum("ecd,edh->ech", expert_in, w1) + b1[:, None, :]
    h = jax.nn.gelu(h, approximate=False)
    return jnp.einsum("ech,ehd->ecd", h, w2) + b2[:, None, :]


def _capacity(tokens: int, num_experts: int, top_k: int,
              capacity_factor: float) -> int:
    return max(1, int(np.ceil(tokens / num_experts * capacity_factor
                              * top_k)))


def moe_ffn(x, params: Dict, *, top_k: int = 1,
            capacity_factor: float = 1.25, return_aux: bool = False):
    """Dense (single-device) MoE FFN: (..., D) -> (..., D).

    ``return_aux`` also returns the Switch load-balance loss (see
    :func:`route`)."""
    lead, d = x.shape[:-1], x.shape[-1]
    x2 = x.reshape(-1, d)
    e = params["router"].shape[-1]
    cap = _capacity(x2.shape[0], e, top_k, capacity_factor)
    routed = route(x2, params["router"], top_k=top_k, capacity=cap,
                   return_aux=return_aux)
    dispatch, combine = routed[0], routed[1]
    expert_in = jnp.einsum("tec,td->ecd", dispatch,
                           x2.astype(jnp.float32))
    y = _expert_ffn(expert_in, params["w1"].astype(jnp.float32),
                    params["b1"].astype(jnp.float32),
                    params["w2"].astype(jnp.float32),
                    params["b2"].astype(jnp.float32))
    out = jnp.einsum("tec,ecd->td", combine, y)
    out = out.astype(x.dtype).reshape(*lead, d)
    if return_aux:
        return out, routed[2]
    return out


def expert_parallel_ffn(x, params: Dict, mesh: Mesh, *, ep_axis: str = "ep",
                        top_k: int = 1, capacity_factor: float = 1.25):
    """MoE FFN with tokens AND experts sharded over ``ep_axis``.

    ``x``: (T, D) with T divisible by the ep size; experts divisible too.
    Any other mesh axes stay auto (shard_map manual over ep only), so this
    composes with dp-sharded callers.
    """
    ep = mesh.shape[ep_axis]
    t, d = x.shape
    e = params["router"].shape[-1]
    assert t % ep == 0, (t, ep)
    assert e % ep == 0, (e, ep)
    cap = _capacity(t // ep, e, top_k, capacity_factor)

    def local(x_loc, router, w1, b1, w2, b2):
        dispatch, combine = route(x_loc, router, top_k=top_k, capacity=cap)
        expert_in = jnp.einsum("tec,td->ecd", dispatch,
                               x_loc.astype(jnp.float32))       # (E, C, D)
        # ship expert batches to their owners: split E, concat C
        expert_in = jax.lax.all_to_all(expert_in, ep_axis, split_axis=0,
                                       concat_axis=1, tiled=True)
        y = _expert_ffn(expert_in, w1.astype(jnp.float32),
                        b1.astype(jnp.float32), w2.astype(jnp.float32),
                        b2.astype(jnp.float32))                 # (E/ep, ep*C, D)
        # bring every sender's outputs home: split C, concat E
        y = jax.lax.all_to_all(y, ep_axis, split_axis=1, concat_axis=0,
                               tiled=True)                      # (E, C, D)
        return jnp.einsum("tec,ecd->td", combine, y).astype(x_loc.dtype)

    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(ep_axis, None), P(), P(ep_axis, None, None),
                  P(ep_axis, None), P(ep_axis, None, None), P(ep_axis, None)),
        out_specs=P(ep_axis, None),
        # manual over ep ONLY — other mesh axes (dp, ...) stay auto so a
        # dp-sharded caller composes instead of being forced replicated
        axis_names={ep_axis})
    return mapped(x, params["router"], params["w1"], params["b1"],
                  params["w2"], params["b2"])

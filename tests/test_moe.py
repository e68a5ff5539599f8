"""MoE FFN + expert parallelism (ops/moe.py): routing semantics, the dense
reference, and expert_parallel_ffn == dense on the CPU mesh (fwd + grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bifold_tpu import parallel
from bifold_tpu.ops.moe import (expert_parallel_ffn, init_moe_params,
                                moe_ffn, route)


@pytest.fixture()
def devices():
    assert len(jax.devices()) >= 8
    return jax.devices()


def _params(key, d=16, h=32, e=8):
    return init_moe_params(key, d, h, e)


def test_top1_routing_matches_manual():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((12, 16)), jnp.float32)
    p = _params(jax.random.key(1), e=4)
    out = moe_ffn(x, p, top_k=1, capacity_factor=8.0)  # no drops

    probs = jax.nn.softmax(x @ p["router"], axis=-1)
    for t in range(12):
        e = int(jnp.argmax(probs[t]))
        h = jax.nn.gelu(x[t] @ p["w1"][e] + p["b1"][e], approximate=False)
        y = (h @ p["w2"][e] + p["b2"][e]) * probs[t, e]
        np.testing.assert_allclose(np.asarray(out[t]), np.asarray(y),
                                   rtol=1e-5, atol=1e-5)


def test_capacity_overflow_drops_late_tokens():
    """All tokens route to one expert; capacity 2 -> tokens beyond the first
    two contribute zero (standard static-capacity semantics)."""
    d, e = 8, 4
    p = _params(jax.random.key(0), d=d, h=16, e=e)
    # router forced: expert 0 wins for every token
    p["router"] = jnp.zeros((d, e)).at[:, 0].set(1.0)
    x = jnp.ones((8, d), jnp.float32)
    dispatch, combine = route(x, p["router"], top_k=1, capacity=2)
    kept = np.asarray(jnp.sum(dispatch, axis=(1, 2)))
    np.testing.assert_array_equal(kept, [1, 1, 0, 0, 0, 0, 0, 0])
    out = moe_ffn(x, p, top_k=1, capacity_factor=2 * e / 8)  # cap == 2
    np.testing.assert_array_equal(np.asarray(out[2:]), 0.0)
    assert float(jnp.abs(out[0]).sum()) > 0


@pytest.mark.parametrize("top_k", [1, 2])
def test_expert_parallel_matches_dense(devices, top_k):
    mesh = parallel.make_mesh({"ep": 8}, devices=devices[:8])
    rng = np.random.default_rng(2)
    t, d, h, e = 64, 16, 32, 8
    x = jnp.asarray(rng.standard_normal((t, d)), jnp.float32)
    p = _params(jax.random.key(3), d=d, h=h, e=e)

    # generous capacity -> nothing drops on either path, so per-shard
    # capacity bookkeeping differences vanish and outputs match exactly
    dense = moe_ffn(x, p, top_k=top_k, capacity_factor=16.0)
    ep_out = jax.jit(lambda xx, pp: expert_parallel_ffn(
        xx, pp, mesh, top_k=top_k, capacity_factor=16.0))(x, p)
    np.testing.assert_allclose(np.asarray(ep_out), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_expert_parallel_grads_match_dense(devices):
    mesh = parallel.make_mesh({"dp": 2, "ep": 4}, devices=devices[:8])
    rng = np.random.default_rng(4)
    t, d, h, e = 32, 16, 32, 8
    x = jnp.asarray(rng.standard_normal((t, d)), jnp.float32)
    p = _params(jax.random.key(5), d=d, h=h, e=e)

    def loss_dense(x, p):
        return jnp.sum(moe_ffn(x, p, top_k=1, capacity_factor=16.0) ** 2)

    def loss_ep(x, p):
        return jnp.sum(expert_parallel_ffn(x, p, mesh, top_k=1,
                                           capacity_factor=16.0) ** 2)

    gd = jax.grad(loss_dense, argnums=(0, 1))(x, p)
    ge = jax.jit(jax.grad(loss_ep, argnums=(0, 1)))(x, p)
    for a, b in zip(jax.tree_util.tree_leaves(gd),
                    jax.tree_util.tree_leaves(ge)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

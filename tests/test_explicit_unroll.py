"""Explicit full unroll of the Transformer stacks (r5 perf swing).

When unroll == depth (the TPU default), Transformer bypasses lax.scan and
loops blocks in Python over per-layer param trees split through the
custom-VJP ``_unstack`` — the stacked gradient is then written ONCE
(jnp.stack transpose) instead of through lax.scan's unrolled DUS-copy
chain. These tests pin BIT-IDENTICAL fwd + grad vs the nn.scan path
(deterministic, same stacked param/checkpoint layout) on CPU, where the
suite can afford both compiles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bifold_tpu.models.layers import Transformer


def _setup(fused_qkv=True, lora=4):
    tr = Transformer(dim=32, depth=4, heads=4, mlp_dim=64,
                     fused_qkv=fused_qkv, lora_rank=lora, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 10, 32)),
                    jnp.float32)
    km = jnp.asarray(np.random.default_rng(1).integers(0, 2, (2, 10)),
                     jnp.int32)
    params = tr.init(jax.random.key(0), x, km)["params"]
    return tr, x, km, params


@pytest.mark.parametrize("fused_qkv", [True, False])
def test_explicit_unroll_bitwise_equals_scan(monkeypatch, fused_qkv):
    tr, x, km, params = _setup(fused_qkv=fused_qkv)

    def loss(p):
        return jnp.sum(tr.apply({"params": p}, x, km) ** 2)

    monkeypatch.setenv("BIFOLD_SCAN_UNROLL", "4")
    monkeypatch.setenv("BIFOLD_UNROLL_IMPL", "scan")
    v_scan = jax.jit(loss).lower(params).compile()(params)
    g_scan = jax.jit(jax.grad(loss)).lower(params).compile()(params)
    monkeypatch.setenv("BIFOLD_UNROLL_IMPL", "explicit")
    v_exp = jax.jit(loss)(params)
    g_exp = jax.jit(jax.grad(loss))(params)

    assert float(v_scan) == float(v_exp)
    for (ka, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_scan),
            jax.tree_util.tree_leaves_with_path(g_exp)):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=jax.tree_util.keystr(ka))


def test_explicit_unroll_partitioned_grads(monkeypatch):
    """Gradients restricted to a sub-tree (LoRA-style partitioned training)
    still match — the per-leaf _unstack keeps frozen stacked leaves off the
    AD path."""
    tr, x, km, params = _setup()
    lora = {k: v for k, v in params.items()}  # flat: blocks only

    def loss(trainable, frozen):
        merged = jax.tree_util.tree_map(lambda a, b: a + b, trainable, frozen)
        return jnp.sum(tr.apply({"params": merged}, x, km) ** 2)

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    monkeypatch.setenv("BIFOLD_SCAN_UNROLL", "4")
    monkeypatch.setenv("BIFOLD_UNROLL_IMPL", "scan")
    g_scan = jax.jit(jax.grad(loss)).lower(zeros, params).compile()(
        zeros, params)
    monkeypatch.setenv("BIFOLD_UNROLL_IMPL", "explicit")
    g_exp = jax.jit(jax.grad(loss))(zeros, params)
    for (ka, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_scan),
            jax.tree_util.tree_leaves_with_path(g_exp)):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=jax.tree_util.keystr(ka))


def test_explicit_unroll_dropout_runs(monkeypatch):
    """Dropout path: not bit-equal to scan (different per-layer key
    derivation, documented) but must run and differ across rng keys."""
    monkeypatch.setenv("BIFOLD_SCAN_UNROLL", "4")
    monkeypatch.setenv("BIFOLD_UNROLL_IMPL", "explicit")
    tr = Transformer(dim=32, depth=4, heads=4, mlp_dim=64, dropout=0.5,
                     dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 10, 32)),
                    jnp.float32)
    params = tr.init(jax.random.key(0), x)["params"]
    o1 = tr.apply({"params": params}, x, deterministic=False,
                  rngs={"dropout": jax.random.key(1)})
    o2 = tr.apply({"params": params}, x, deterministic=False,
                  rngs={"dropout": jax.random.key(2)})
    assert np.isfinite(np.asarray(o1)).all()
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 0

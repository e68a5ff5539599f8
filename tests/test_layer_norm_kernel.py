"""Pallas LayerNorm backend (ops/layer_norm.py): numerics vs the XLA path.

The kernel is an opt-in lever (BIFOLD_LN_KERNEL=pallas — measured 3x faster
at the op level but net-neutral-to-worse end-to-end; module docstring has
the numbers). These tests keep the lever correct: same outputs, residual
stats, and gradients as the default path, driven through the REAL kernels
in interpret mode on CPU, at divisible and ragged row counts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bifold_tpu.models.layers import _layer_norm
from bifold_tpu.ops import layer_norm as lnk


@pytest.fixture()
def pallas_ln(monkeypatch):
    monkeypatch.setenv("BIFOLD_LN_KERNEL", "pallas")
    monkeypatch.setenv("BIFOLD_LN_INTERPRET", "1")


def _inputs(shape, key, dtype=jnp.float32):
    c = shape[-1]
    k = jax.random.split(key, 4)
    x = (jax.random.normal(k[0], shape, jnp.float32) * 2 + 0.5).astype(dtype)
    scale = jax.random.normal(k[1], (c,)) * 0.1 + 1.0
    bias = jax.random.normal(k[2], (c,)) * 0.1
    w = jax.random.normal(k[3], shape)
    return x, scale, bias, w


@pytest.mark.parametrize("shape,dtype", [
    ((2, 2373, 768), jnp.float32),   # flagship fusion shape (ragged rows)
    ((8, 576, 768), jnp.bfloat16),   # vision tower shape, bf16 activations
    ((5, 512), jnp.float32),         # exactly one block after padding
])
def test_pallas_ln_matches_xla(pallas_ln, shape, dtype):
    x, scale, bias, w = _inputs(shape, jax.random.key(0), dtype)

    def loss(x, scale, bias):
        return jnp.sum(_layer_norm(x, scale, bias, 1e-6).astype(jnp.float32)
                       * w)

    with jax.disable_jit(False):
        out = jax.jit(lambda *a: _layer_norm(*a, 1e-6))(x, scale, bias)
        grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, scale, bias)

    import os
    os.environ["BIFOLD_LN_KERNEL"] = "xla"
    ref = _layer_norm(x, scale, bias, 1e-6)
    gref = jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias)

    # bf16 in/out: the two paths may round one ulp apart (fma ordering)
    tol = dict(rtol=2e-2, atol=4e-2) if dtype == jnp.bfloat16 \
        else dict(rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **tol)
    # dscale/dbias sum thousands of rows -> reduction-order noise only
    for g, gr in zip(grads, gref):
        gtol = tol if np.asarray(g).dtype == np.dtype("bfloat16") else \
            dict(rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(gr, np.float32), **gtol)


def test_non_multiple_of_128_channels_fall_back(pallas_ln):
    # 192-wide decoder LNs must take the XLA path even when forced
    assert not lnk.use_pallas_ln(192)
    assert lnk.use_pallas_ln(768)


def test_default_is_xla(monkeypatch):
    monkeypatch.delenv("BIFOLD_LN_KERNEL", raising=False)
    assert not lnk.use_pallas_ln(768)
    assert lnk.ln_mode() == ""


@pytest.fixture()
def fused_ln(monkeypatch):
    monkeypatch.setenv("BIFOLD_LN_KERNEL", "fused")
    monkeypatch.setenv("BIFOLD_LN_INTERPRET", "1")


@pytest.mark.parametrize("shape,dtype", [
    ((2, 321, 768), jnp.float32),    # ragged rows
    ((4, 576, 768), jnp.bfloat16),   # bf16 residual stream
])
def test_fused_add_ln_matches_unfused(fused_ln, shape, dtype):
    from bifold_tpu.models.layers import _fused_add_ln

    x, scale, bias, w = _inputs(shape, jax.random.key(1), dtype)
    delta = (jax.random.normal(jax.random.key(2), shape, jnp.float32)
             * 0.3).astype(dtype)
    w2 = jax.random.normal(jax.random.key(3), shape)

    def loss_fused(x, delta, scale, bias):
        s, y = _fused_add_ln(x, delta, scale, bias, 1e-6)
        # both outputs used -> both cotangents (ds_out and dy) exercised
        return jnp.sum(y.astype(jnp.float32) * w) + \
            jnp.sum(s.astype(jnp.float32) * w2)

    def loss_ref(x, delta, scale, bias):
        s = x + delta
        y = _layer_norm(s, scale, bias, 1e-6)
        return jnp.sum(y.astype(jnp.float32) * w) + \
            jnp.sum(s.astype(jnp.float32) * w2)

    s, y = jax.jit(lambda *a: _fused_add_ln(*a, 1e-6))(x, delta, scale, bias)
    grads = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3)))(
        x, delta, scale, bias)

    import os
    os.environ["BIFOLD_LN_KERNEL"] = ""          # reference path: plain XLA
    exp_s = (x.astype(jnp.float32) + delta.astype(jnp.float32)).astype(dtype)
    np.testing.assert_array_equal(np.asarray(s, np.float32),
                                  np.asarray(exp_s, np.float32))
    ref_y = _layer_norm(exp_s, scale, bias, 1e-6)
    gref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, delta, scale, bias)

    tol = dict(rtol=2e-2, atol=4e-2) if dtype == jnp.bfloat16 \
        else dict(rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref_y, np.float32), **tol)
    for g, gr in zip(grads, gref):
        gtol = tol if np.asarray(g).dtype == np.dtype("bfloat16") else \
            dict(rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(gr, np.float32), **gtol)


@pytest.mark.parametrize("scan_layers", [True, False])
def test_fused_transformer_wiring_matches_default(fused_ln, scan_layers):
    """The (residual, pending_delta) carry rewiring under
    BIFOLD_LN_KERNEL=fused is numerically the standard pre-norm stack."""
    import os

    from bifold_tpu.models.layers import Transformer

    tf = Transformer(dim=128, depth=3, heads=4, mlp_dim=256,
                     scan_layers=scan_layers)
    x = jax.random.normal(jax.random.key(0), (2, 17, 128))
    mask = jnp.ones((2, 17), jnp.int32)
    params = tf.init(jax.random.key(1), x, mask)

    def loss(p, x):
        return jnp.sum(tf.apply(p, x, mask).astype(jnp.float32) ** 2)

    out_fused = jax.jit(tf.apply)(params, x, mask)
    g_fused = jax.jit(jax.grad(loss, argnums=1))(params, x)

    os.environ["BIFOLD_LN_KERNEL"] = ""
    out_ref = jax.jit(tf.apply)(params, x, mask)
    g_ref = jax.jit(jax.grad(loss, argnums=1))(params, x)

    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)

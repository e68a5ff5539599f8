"""Residual-lean custom VJPs (layers.py, clip_backbone.py) vs jax autodiff.

These ops exist purely to shrink the backward's saved residuals (CLAUDE.md
round 2); their gradients must match the plain implementations they replace.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bifold_tpu.models.backbones.clip_backbone import quick_gelu
from bifold_tpu.models.layers import LayerNorm, gelu_exact, gelu_tanh


@pytest.fixture
def x64(rng):
    return jnp.asarray(rng.standard_normal((4, 64)) * 2.0, jnp.float32)


def _grad_close(f, g, x, atol=1e-5):
    gf = jax.grad(lambda t: jnp.sum(f(t) ** 2))(x)
    gg = jax.grad(lambda t: jnp.sum(g(t) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gg), atol=atol)


def test_gelu_exact_matches_jax(x64):
    np.testing.assert_allclose(np.asarray(gelu_exact(x64)),
                               np.asarray(nn.gelu(x64, approximate=False)),
                               atol=1e-6)
    _grad_close(gelu_exact, lambda t: nn.gelu(t, approximate=False), x64)


def test_gelu_tanh_matches_jax(x64):
    np.testing.assert_allclose(np.asarray(gelu_tanh(x64)),
                               np.asarray(nn.gelu(x64, approximate=True)),
                               atol=1e-6)
    _grad_close(gelu_tanh, lambda t: nn.gelu(t, approximate=True), x64)


def test_quick_gelu_matches_plain(x64):
    plain = lambda t: t * jax.nn.sigmoid(1.702 * t)
    np.testing.assert_allclose(np.asarray(quick_gelu(x64)),
                               np.asarray(plain(x64)), atol=1e-6)
    _grad_close(quick_gelu, plain, x64)


def test_layernorm_matches_flax(rng):
    x = jnp.asarray(rng.standard_normal((2, 10, 48)), jnp.float32)
    ours = LayerNorm(epsilon=1e-6)
    ref = nn.LayerNorm(epsilon=1e-6)
    v_ours = ours.init(jax.random.key(0), x)
    v_ref = ref.init(jax.random.key(0), x)
    # non-trivial affine params so dscale/dbias are exercised
    scale = jnp.asarray(rng.standard_normal((48,)) + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((48,)), jnp.float32)
    v_ours = {"params": {"scale": scale, "bias": bias}}
    v_ref = {"params": {"scale": scale, "bias": bias}}

    np.testing.assert_allclose(np.asarray(ours.apply(v_ours, x)),
                               np.asarray(ref.apply(v_ref, x)), atol=1e-5)

    def loss(mod, variables, t):
        return jnp.sum(mod.apply(variables, t) ** 2)

    g_ours = jax.grad(loss, argnums=(1, 2))(ours, v_ours, x)
    g_ref = jax.grad(loss, argnums=(1, 2))(ref, v_ref, x)
    np.testing.assert_allclose(np.asarray(g_ours[1]), np.asarray(g_ref[1]),
                               atol=1e-4)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(np.asarray(g_ours[0]["params"][k]),
                                   np.asarray(g_ref[0]["params"][k]),
                                   atol=1e-4, rtol=1e-5)


def test_layernorm_bf16_residuals_are_lean(rng):
    """The whole point: no float32 full-width tensors in the saved residuals."""
    from jax._src.ad_checkpoint import saved_residuals

    x = jnp.asarray(rng.standard_normal((4, 256, 768)), jnp.bfloat16)
    scale = jnp.ones((768,), jnp.float32)
    bias = jnp.zeros((768,), jnp.float32)
    mod = LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)
    variables = {"params": {"scale": scale, "bias": bias}}

    def f(t):
        # linear readout: any full-width f32 residual must come from LN itself
        return jnp.sum(mod.apply(variables, t).astype(jnp.float32))

    big_f32 = [aval for aval, _ in saved_residuals(f, x)
               if aval.dtype == jnp.float32 and aval.size >= 4 * 256 * 768]
    assert not big_f32, big_f32


def test_gelu_bf16_grad_finite_at_extremes():
    x = jnp.asarray([-50.0, -10.0, 0.0, 10.0, 50.0], jnp.bfloat16)
    for f in (gelu_exact, gelu_tanh, quick_gelu):
        g = jax.grad(lambda t: jnp.sum(f(t).astype(jnp.float32)))(x)
        assert np.isfinite(np.asarray(g, np.float32)).all(), f

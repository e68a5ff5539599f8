"""Attention backends: XLA vs Pallas-flash parity, masking semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bifold_tpu.ops.attention import dot_product_attention
from bifold_tpu.ops.flash_attention import flash_attention


def _qkv(rng, b=2, n=160, h=4, d=32):
    q, k, v = (rng.normal(size=(b, n, h, d)).astype(np.float32) for _ in range(3))
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_flash_matches_xla_no_mask(rng):
    q, k, v = _qkv(rng)
    ref = dot_product_attention(q, k, v, backend="xla")
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_matches_xla_with_key_mask(rng):
    q, k, v = _qkv(rng, n=96)
    mask = (rng.random((2, 96)) > 0.3).astype(np.int32)
    mask[:, 0] = 1  # at least one valid key
    ref = dot_product_attention(q, k, v, key_mask=jnp.asarray(mask), backend="xla")
    out = flash_attention(q, k, v, key_mask=jnp.asarray(mask),
                          block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_handles_non_multiple_lengths(rng):
    # 100 tokens with 128-blocks: padding path must not corrupt outputs
    q, k, v = _qkv(rng, n=100)
    ref = dot_product_attention(q, k, v, backend="xla")
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_key_mask_blocks_padded_keys(rng):
    q, k, v = _qkv(rng, n=32)
    mask = np.ones((2, 32), np.int32)
    mask[:, 16:] = 0
    out1 = dot_product_attention(q, k, v, key_mask=jnp.asarray(mask), backend="xla")
    # changing masked keys must not change the output
    k2 = jnp.asarray(np.concatenate([np.asarray(k)[:, :16], 1e3 * np.ones_like(np.asarray(k)[:, 16:])], axis=1))
    v2 = jnp.asarray(np.concatenate([np.asarray(v)[:, :16], -1e3 * np.ones_like(np.asarray(v)[:, 16:])], axis=1))
    out2 = dot_product_attention(q, k2, v2, key_mask=jnp.asarray(mask), backend="xla")
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_legacy_query_mask_reproduces_reference_quirk(rng):
    """The reference masks the query dim (transformer.py:33-35): padded-row
    outputs become uniform averages, and padded KEYS still contribute."""
    q, k, v = _qkv(rng, n=16)
    mask = np.ones((2, 16), np.int32)
    mask[:, 8:] = 0
    out = dot_product_attention(q, k, v, legacy_query_mask=jnp.asarray(mask), backend="xla")
    # reference numpy: softmax over keys of (masked-query rows -> all -1e5 -> uniform)
    qn, kn, vn = (np.asarray(t) for t in (q, k, v))
    scale = qn.shape[-1] ** -0.5
    logits = np.einsum("bqhd,bkhd->bhqk", qn, kn) * scale
    logits = np.where(mask[:, None, :, None] == 0, -100000.0, logits)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bkhd->bqhd", probs, vn)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_causal_mask(rng):
    q, k, v = _qkv(rng, n=24)
    out = dot_product_attention(q, k, v, causal=True, backend="xla")
    # last-token change must not affect earlier outputs
    k2 = jnp.asarray(np.asarray(k)).at[:, -1].set(100.0)
    v2 = jnp.asarray(np.asarray(v)).at[:, -1].set(100.0)
    out2 = dot_product_attention(q, k2, v2, causal=True, backend="xla")
    np.testing.assert_allclose(np.asarray(out[:, :-1]), np.asarray(out2[:, :-1]), atol=1e-5)
    assert not np.allclose(np.asarray(out[:, -1]), np.asarray(out2[:, -1]))


def test_flash_grad_flows(rng):
    q, k, v = _qkv(rng, b=1, n=64, h=2, d=16)

    def loss(q):
        return flash_attention(q, k, v, block_q=128, block_k=128, interpret=True).sum()

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_flash_backward_matches_xla_reference():
    """Blockwise Pallas backward (dq/dk/dv from saved logsumexp) vs the wide
    XLA attention gradients."""
    import jax
    import jax.numpy as jnp

    from bifold_tpu.ops.flash_attention import _xla_reference, flash_attention

    rng = np.random.default_rng(0)
    b, n, h, d = 2, 300, 4, 48
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, (b, n)).astype(np.int32)).at[:, :4].set(1)

    g_flash = jax.grad(lambda *a: (flash_attention(*a, mask, interpret=True) ** 2).sum(),
                       argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda *a: (_xla_reference(*a, mask, d ** -0.5) ** 2).sum(),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        assert float(jnp.abs(a - b_).max()) < 1e-4


@pytest.mark.parametrize("flag", ["BIFOLD_FLASH_BF16_D",
                                  "BIFOLD_FLASH_BF16_BLOCK"])
def test_flash_bf16_experiment_flags_stay_close(flag, monkeypatch):
    """The measured-and-rejected bf16 matmul-input experiment levers still
    produce CORRECT attention (bf16 inputs, f32 accumulate) — within bf16
    input-rounding tolerance of the f32 reference, fwd and bwd."""
    import jax
    import jax.numpy as jnp

    from bifold_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(1)
    b, n, h, d = 1, 200, 2, 48
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, (b, n)).astype(np.int32)).at[:, :4].set(1)

    def loss(*a):
        return (fa.flash_attention(*a, mask, interpret=True) ** 2).sum()

    out_ref = fa.flash_attention(q, k, v, key_mask=mask, interpret=True)
    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    monkeypatch.setenv(flag, "1")
    out = fa.flash_attention(q, k, v, key_mask=mask, interpret=True)
    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    assert float(jnp.abs(out - out_ref).max()) < 5e-2
    scale = max(float(jnp.abs(gr).max()) for gr in g_ref)
    for a, r in zip(g, g_ref):
        assert float(jnp.abs(a - r).max()) < 5e-2 * scale


def test_flash_partitions_over_batch_and_heads():
    """Under a sharded jit the flash custom-call must partition over (b, h)
    — not be replicated (XLA's default for opaque custom-calls, which would
    all-gather activations and destroy dp/tp scaling). Checks numerics and
    that the compiled module contains no all-gather."""
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("dp", "tp"))
    rng = np.random.default_rng(3)
    b, n, h, d = 8, 256, 4, 32
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
               for _ in range(3))
    mask = jnp.asarray(rng.integers(0, 2, (b, n)), jnp.int32).at[:, :4].set(1)

    qs = NamedSharding(mesh, P("dp", None, "tp", None))
    ms = NamedSharding(mesh, P("dp", None))
    qp, kp, vp = (jax.device_put(t, qs) for t in (q, k, v))
    mp = jax.device_put(mask, ms)

    def loss(q, k, v, m):
        return jnp.sum(flash_attention(q, k, v, key_mask=m, block_q=128,
                                       block_k=128, interpret=True) ** 2)

    fwd = jax.jit(lambda *a: flash_attention(*a[:3], key_mask=a[3],
                                             block_q=128, block_k=128,
                                             interpret=True),
                  in_shardings=(qs, qs, qs, ms))
    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)),
                   in_shardings=(qs, qs, qs, ms))

    out = fwd(qp, kp, vp, mp)
    ref = _xla_ref_for_test(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    g = grad(qp, kp, vp, mp)
    g_ref = jax.grad(lambda *a: jnp.sum(_xla_ref_for_test(*a) ** 2),
                     argnums=(0, 1, 2))(q, k, v, mask)
    for a, b_ in zip(g, g_ref):
        assert float(jnp.abs(a - b_).max()) < 1e-4

    for fn, args in ((fwd, (qp, kp, vp, mp)), (grad, (qp, kp, vp, mp))):
        hlo = fn.lower(*args).compile().as_text()
        assert "all-gather" not in hlo, "flash attention was replicated"


def _xla_ref_for_test(q, k, v, mask):
    from bifold_tpu.ops.flash_attention import _xla_reference

    return _xla_reference(q, k, v, mask, q.shape[-1] ** -0.5)


def test_flash_residency_ceiling_is_explicit_error():
    """Sequences whose full-row K/V (+ backward dk/dv accumulator) VMEM
    residency cannot fit must fail with an actionable ValueError at trace
    time, not a Mosaic OOM (ADVICE r2)."""
    import jax
    import jax.numpy as jnp

    from bifold_tpu.ops.flash_attention import flash_attention

    n, d = 300_000, 64  # bwd residency ~230 MB > the 96 MB ceiling
    q = jnp.zeros((1, n, 1, d), jnp.bfloat16)

    with pytest.raises(ValueError, match="VMEM"):
        jax.eval_shape(
            lambda a: jax.grad(
                lambda x: flash_attention(x, x, x, interpret=True)
                .astype(jnp.float32).sum())(a), q)


@pytest.mark.parametrize("ragged", ["0", "1"])
def test_flash_ragged_and_padded_layouts_match_xla(ragged, monkeypatch):
    """Both kernel entry layouts (r5 pad-free ragged q/kv blocks vs the
    padded r1 layout) stay covered whatever the shipped default: fwd+grad
    vs the wide XLA reference at block-awkward lengths (nq=300 trailing
    ragged q block, nk=200 oversize K/V block, random key mask)."""
    from bifold_tpu.ops.flash_attention import _xla_reference

    monkeypatch.setenv("BIFOLD_FLASH_RAGGED", ragged)
    rng = np.random.default_rng(3)
    b, nq, nk, h, d = 2, 300, 200, 2, 48
    q = jnp.asarray(rng.standard_normal((b, nq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, nk, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, nk, h, d)), jnp.float32)
    mask = jnp.asarray(
        rng.integers(0, 2, (b, nk)).astype(np.int32)).at[:, :4].set(1)

    def loss_flash(*a):
        return (flash_attention(*a, mask, block_q=128, block_k=128,
                                interpret=True) ** 2).sum()

    def loss_ref(*a):
        return (_xla_reference(*a, mask, d ** -0.5) ** 2).sum()

    out = flash_attention(q, k, v, mask, block_q=128, block_k=128,
                          interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_xla_reference(q, k, v, mask, d ** -0.5)),
        atol=2e-5)
    g = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, r in zip(g, g_ref):
        assert float(jnp.abs(a - r).max()) < 1e-4


@pytest.mark.parametrize("ragged", ["0", "1"])
def test_fully_masked_rows_match_xla_backend(ragged, monkeypatch):
    """Degenerate all-masked key rows (representable, if unreachable from
    the processor) must agree across backends: uniform probabilities ->
    mean(v), not 0. The r5 ragged layout first shipped zeroing USER-masked
    v rows in-kernel, which silently changed this case to 0. The follow-up
    fix zeroes p on columns past the TRUE kv length in both kernel modes,
    so the softmax normalizer counts exactly nk columns — the historical
    mean(v) * nk/nk_pad quirk at non-block-multiple lengths is gone — and
    masks ds by the user key mask, matching the XLA backend's (and torch
    masked_fill's) gradient-blocking `where` on degenerate rows."""
    from bifold_tpu.ops.flash_attention import _xla_reference

    monkeypatch.setenv("BIFOLD_FLASH_RAGGED", ragged)
    rng = np.random.default_rng(11)
    # nk=200 exercises the non-block-multiple path (nk_pad=256): the
    # pre-fix kernels returned mean(v) * 200/256 on degenerate rows there.
    for b, nq, nk, h, d in ((2, 128, 128, 2, 32), (2, 300, 200, 2, 32)):
        q = jnp.asarray(rng.standard_normal((b, nq, h, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, nk, h, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, nk, h, d)), jnp.float32)
        mask = np.ones((b, nk), np.int32)
        mask[0, :] = 0  # sample 0: every key masked
        mask = jnp.asarray(mask)

        out = flash_attention(q, k, v, mask, block_q=128, block_k=128,
                              interpret=True)
        ref = _xla_reference(q, k, v, mask, d ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)
        # sample 0's rows are the per-head mean of v, not zero
        want = np.asarray(jnp.mean(v[0], axis=0))  # (h, d)
        np.testing.assert_allclose(np.asarray(out[0, 0]), want, atol=2e-5)
        g = jax.grad(lambda *a: (flash_attention(
            *a, mask, block_q=128, block_k=128, interpret=True) ** 2).sum(),
            argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(lambda *a: (_xla_reference(
            *a, mask, d ** -0.5) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
        for a, r in zip(g, g_ref):
            assert np.isfinite(np.asarray(a)).all()
            # sample 1 (normal rows): tight parity. Sample 0 (degenerate):
            # the kernel recomputes p = exp(s - lse) with lse = _NEG +
            # log(nk); at |_NEG| = 1e5 the f32 ulp is ~0.008, so p carries
            # ~1e-3 relative noise on degenerate rows only — looser gate.
            assert float(jnp.abs(a[1] - r[1]).max()) < 1e-4
            assert float(jnp.abs(a[0] - r[0]).max()) < 2e-3

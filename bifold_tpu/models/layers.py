"""Shared Flax building blocks: attention, MLP, pre-norm transformer, pos embeds.

TPU-native counterparts of /root/reference/bifold/models/{transformer,modules}.py.
All matmuls run in a configurable compute dtype (bfloat16 by default upstream)
with float32 params and float32 softmax/LayerNorm accumulation.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from bifold_tpu.ops.attention import dot_product_attention

__all__ = [
    "LayerNorm",
    "MultiHeadAttention",
    "FeedForward",
    "MoEFeedForward",
    "TransformerBlock",
    "Transformer",
    "gelu_exact",
    "gelu_tanh",
    "get_2d_sincos_pos_embed",
    "normal_init",
]

# reference init_weights: normal(0, 0.02) for Linear/Embedding (models/utils.py:86-94)
normal_init = nn.initializers.normal(stddev=0.02)


# ---------------------------------------------------------------------------
# Residual-lean LayerNorm and GELU.
#
# Under nn.scan the backward materializes every per-layer AD residual as a
# [depth, ...] stack in HBM. flax's LayerNorm saves three float32 stacks of
# the full hidden state per call (the _normalize intermediates), and jax's
# gelu saves four-plus 3072-wide stacks of tanh/erf intermediates per MLP.
# These custom VJPs save only the bfloat16 inputs (plus per-row LN stats)
# and recompute the cheap elementwise math in the backward — on the flagship
# step that removes ~4 GB of saved activations (measured with
# jax.ad_checkpoint.saved_residuals; see tools/attn_bench.py history).
# ---------------------------------------------------------------------------

import jax  # noqa: E402  (after flax import for readability above)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm(x, scale, bias, eps):
    out, _ = _layer_norm_fwd(x, scale, bias, eps)
    return out


def _layer_norm_stats(xf, eps):
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    # fast variance (matches flax use_fast_variance): E[x^2] - E[x]^2
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    return mean, jax.lax.rsqrt(var + eps)


def _layer_norm_fwd(x, scale, bias, eps):
    # Opt-in Pallas backend (BIFOLD_LN_KERNEL=pallas): the kernel beats
    # XLA's LN op 3x but loses net step time to un-fused neighbors — kept
    # as a measured lever, default off (see ops/layer_norm.py docstring).
    from bifold_tpu.ops import layer_norm as _ln_kernel

    if x.ndim >= 2 and _ln_kernel.use_pallas_ln(x.shape[-1]):
        out, mean, rstd = _ln_kernel.ln_forward(x, scale, bias, eps)
        return out, (x, mean, rstd, scale)
    xf = x.astype(jnp.float32)
    mean, rstd = _layer_norm_stats(xf, eps)
    y = (xf - mean) * rstd
    out = (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)
    return out, (x, mean, rstd, scale)


def _layer_norm_bwd(eps, res, dy):
    x, mean, rstd, scale = res
    from bifold_tpu.ops import layer_norm as _ln_kernel

    if x.ndim >= 2 and _ln_kernel.use_pallas_ln(x.shape[-1]):
        dx, dscale, dbias = _ln_kernel.ln_backward(x, dy, mean, rstd, scale)
        return (dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype))
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    xhat = (xf - mean) * rstd
    dscale = jnp.sum(dyf * xhat, axis=tuple(range(dy.ndim - 1)))
    dbias = jnp.sum(dyf, axis=tuple(range(dy.ndim - 1)))
    dxhat = dyf * scale.astype(jnp.float32)
    dx = rstd * (dxhat
                 - jnp.mean(dxhat, axis=-1, keepdims=True)
                 - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


_layer_norm.defvjp(_layer_norm_fwd, _layer_norm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_add_ln(x, delta, scale, bias, eps):
    """(s, y) where s = x + delta and y = LN(s) — one Pallas pass each way
    (BIFOLD_LN_KERNEL=fused); the backward folds the residual-stream
    cotangent ds into the LN backward so no standalone add survives."""
    return _fused_add_ln_fwd(x, delta, scale, bias, eps)[0]


def _fused_add_ln_fwd(x, delta, scale, bias, eps):
    from bifold_tpu.ops import layer_norm as _ln_kernel

    s, y, mean, rstd = _ln_kernel.fused_ln_forward(x, delta, scale, bias, eps)
    return (s, y), (s, mean, rstd, scale)


def _fused_add_ln_bwd(eps, res, cts):
    ds_out, dy = cts
    s, mean, rstd, scale = res
    from bifold_tpu.ops import layer_norm as _ln_kernel

    ds, dscale, dbias = _ln_kernel.fused_ln_backward(
        s, dy, ds_out, mean, rstd, scale)
    return (ds, ds, dscale.astype(scale.dtype), dbias.astype(scale.dtype))


_fused_add_ln.defvjp(_fused_add_ln_fwd, _fused_add_ln_bwd)


class LayerNorm(nn.Module):
    """Drop-in for nn.LayerNorm (same param names/shapes) whose backward
    recomputes the normalization from the bfloat16 input instead of saving
    float32 intermediates. Stats always accumulate in float32.

    ``__call__(x, residual=delta)`` additionally performs the pre-norm
    residual add and returns ``(s, y)`` with ``s = x + delta``,
    ``y = LN(s)`` — fused into one Pallas pass under
    ``BIFOLD_LN_KERNEL=fused`` (plain add + norm otherwise)."""

    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None):
        from bifold_tpu.ops import layer_norm as _ln_kernel

        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        eps = float(self.epsilon)
        if residual is None:
            return _layer_norm(x.astype(self.dtype), scale, bias, eps)
        x = x.astype(self.dtype)
        residual = residual.astype(self.dtype)
        if (x.ndim >= 2 and _ln_kernel.ln_mode() == "fused"
                and _ln_kernel.use_pallas_ln(dim)):
            return _fused_add_ln(x, residual, scale, bias, eps)
        s = x + residual
        return s, _layer_norm(s, scale, bias, eps)


_SQRT_2_OVER_PI = 0.7978845608028654
_TANH_C = 0.044715


@jax.custom_vjp
def gelu_tanh(x):
    """gelu(approximate=True) saving only x for the backward."""
    return _gelu_tanh_fwd(x)[0]


def _gelu_tanh_fwd(x):
    xf = x.astype(jnp.float32)
    t = jnp.tanh(_SQRT_2_OVER_PI * (xf + _TANH_C * xf ** 3))
    return (0.5 * xf * (1.0 + t)).astype(x.dtype), x


def _gelu_tanh_bwd(x, dy):
    xf = x.astype(jnp.float32)
    u = _SQRT_2_OVER_PI * (xf + _TANH_C * xf ** 3)
    t = jnp.tanh(u)
    du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _TANH_C * xf * xf)
    dgelu = 0.5 * (1.0 + t) + 0.5 * xf * (1.0 - t * t) * du
    return ((dy.astype(jnp.float32) * dgelu).astype(x.dtype),)


gelu_tanh.defvjp(_gelu_tanh_fwd, _gelu_tanh_bwd)


@jax.custom_vjp
def gelu_exact(x):
    """Exact (erf) gelu, like torch nn.GELU default, saving only x."""
    return _gelu_exact_fwd(x)[0]


def _gelu_exact_fwd(x):
    xf = x.astype(jnp.float32)
    cdf = 0.5 * (1.0 + jax.lax.erf(xf / jnp.sqrt(2.0).astype(jnp.float32)))
    return (xf * cdf).astype(x.dtype), x


def _gelu_exact_bwd(x, dy):
    xf = x.astype(jnp.float32)
    cdf = 0.5 * (1.0 + jax.lax.erf(xf / jnp.sqrt(2.0).astype(jnp.float32)))
    pdf = jnp.exp(-0.5 * xf * xf) * (1.0 / jnp.sqrt(2.0 * jnp.pi)).astype(jnp.float32)
    return ((dy.astype(jnp.float32) * (cdf + xf * pdf)).astype(x.dtype),)


gelu_exact.defvjp(_gelu_exact_fwd, _gelu_exact_bwd)


class MultiHeadAttention(nn.Module):
    """QKV attention with separate projections.

    ``fused_qkv`` mirrors the reference fusion transformer's single
    ``to_qkv`` (bias-free) projection (transformer.py:21); towers use
    separate biased q/k/v. LoRA adapters can be enabled per-projection.
    """

    dim: int
    heads: int
    dim_head: Optional[int] = None
    fused_qkv: bool = False
    qkv_bias: bool = True
    out_bias: bool = True
    project_out: bool = True
    causal: bool = False
    dropout: float = 0.0
    lora_rank: int = 0
    lora_alpha: float = 1.0
    lora_dropout: float = 0.0
    lora_targets: tuple = ("q_proj", "v_proj")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, key_mask=None, *, legacy_query_mask=None, deterministic=True,
                 return_weights=False):
        d_head = self.dim_head or self.dim // self.heads
        inner = d_head * self.heads

        def proj(feats, name):
            if self.lora_rank > 0 and name in self.lora_targets:
                from bifold_tpu.models.lora import LoRADense

                return lambda y: LoRADense(
                    features=feats, use_bias=self.qkv_bias, rank=self.lora_rank,
                    alpha=self.lora_alpha, lora_dropout=self.lora_dropout,
                    dtype=self.dtype, name=name,
                )(y, deterministic=deterministic)
            return nn.Dense(feats, use_bias=self.qkv_bias, dtype=self.dtype, name=name)

        if self.fused_qkv:
            qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = proj(inner, "q_proj")(x)
            k = proj(inner, "k_proj")(x)
            v = proj(inner, "v_proj")(x)

        b, n, _ = x.shape
        q = q.reshape(b, n, self.heads, d_head)
        k = k.reshape(b, k.shape[1], self.heads, d_head)
        v = v.reshape(b, v.shape[1], self.heads, d_head)

        out = dot_product_attention(
            q, k, v, key_mask=key_mask, legacy_query_mask=legacy_query_mask,
            causal=self.causal, return_weights=return_weights,
        )
        weights = None
        if return_weights:
            out, weights = out
        out = out.reshape(b, n, inner)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        if self.project_out:
            out = nn.Dense(self.dim, use_bias=self.out_bias, dtype=self.dtype,
                           name="out_proj")(out)
            if self.dropout > 0:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return (out, weights) if return_weights else out


class FeedForward(nn.Module):
    """Linear -> act -> Linear (reference modules.py:18-30)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    # torch nn.GELU default is the exact (erf) form — flax's nn.gelu is NOT
    # (approximate=True); declare the parity-correct default explicitly
    activation: Callable = gelu_exact
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = self.activation(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class MoEFeedForward(nn.Module):
    """Mixture-of-Experts drop-in for :class:`FeedForward`: Switch/GShard
    top-k capacity routing over ``num_experts`` per-expert 2-layer gelu FFNs
    (static shapes throughout — routing is three einsums, ops/moe.py). The
    reference has no MoE (its FFNs are dense, modules.py:18-30); this is the
    TPU-native capability for scaling FFN parameters, enabled from config
    via ``model.moe_experts``. Sows the Switch load-balance loss into the
    ``moe_losses`` collection; ``parallel.make_train_step`` folds it into
    the train loss (weight ``model.moe_aux_weight``)."""

    dim: int
    hidden_dim: int
    num_experts: int
    top_k: int = 1
    capacity_factor: float = 1.25
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        from bifold_tpu.ops import moe as moe_ops

        e = self.num_experts
        init = nn.initializers.normal(0.02)
        params = {
            "router": self.param("router", init, (self.dim, e)),
            "w1": self.param("w1", init, (e, self.dim, self.hidden_dim)),
            "b1": self.param("b1", nn.initializers.zeros,
                             (e, self.hidden_dim)),
            "w2": self.param("w2", init, (e, self.hidden_dim, self.dim)),
            "b2": self.param("b2", nn.initializers.zeros, (e, self.dim)),
        }
        x = x.astype(self.dtype)
        # Expert parallelism: when the active mesh (set by the Trainer /
        # dryrun via parallel.set_active_mesh) carries an ep axis that
        # divides experts and tokens, route through the shard_map
        # all_to_all dispatch/combine path (ops/moe.py expert_parallel_ffn;
        # exact == dense at top-1/top-2, tests/test_moe.py). Falls back to
        # the dense one-program path otherwise (init, serving, ep=1).
        from bifold_tpu import parallel

        ep = parallel.active_axis_size("ep")
        tokens = int(np.prod(x.shape[:-1]))
        if (ep > 1 and not self.is_initializing()
                and e % ep == 0 and tokens % ep == 0):
            x2 = x.reshape(-1, x.shape[-1])
            out = moe_ops.expert_parallel_ffn(
                x2, params, parallel.active_mesh(), top_k=self.top_k,
                capacity_factor=self.capacity_factor).reshape(x.shape)
            # load-balance aux from the router alone (dispatch/combine are
            # unused here and DCE'd by XLA) — same global-batch definition
            # as the dense path
            _, _, aux = moe_ops.route(x2, params["router"], top_k=1,
                                      capacity=1, return_aux=True)
        else:
            out, aux = moe_ops.moe_ffn(x, params, top_k=self.top_k,
                                       capacity_factor=self.capacity_factor,
                                       return_aux=True)
        self.sow("moe_losses", "load_balance", aux)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class TransformerBlock(nn.Module):
    """Pre-norm residual block: x + attn(ln(x)); x + mlp(ln(x))."""

    dim: int
    heads: int
    mlp_dim: int
    dim_head: Optional[int] = None
    fused_qkv: bool = True
    causal: bool = False
    dropout: float = 0.0
    activation: Callable = gelu_exact
    lora_rank: int = 0
    lora_alpha: float = 1.0
    lora_dropout: float = 0.0
    ln_eps: float = 1e-6
    # moe_experts > 0 swaps the dense FFN for MoEFeedForward (param name
    # stays "mlp"; layout differs, so it is a from-scratch configuration,
    # not a converted-checkpoint one)
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    dtype: Any = jnp.float32

    def _mlp(self):
        if self.moe_experts > 0:
            return MoEFeedForward(
                dim=self.dim, hidden_dim=self.mlp_dim,
                num_experts=self.moe_experts, top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                dropout=self.dropout, dtype=self.dtype, name="mlp")
        return FeedForward(
            dim=self.dim, hidden_dim=self.mlp_dim, dropout=self.dropout,
            activation=self.activation, dtype=self.dtype, name="mlp")

    @nn.compact
    def __call__(self, x, key_mask=None, *, pending=None, legacy_query_mask=None,
                 deterministic=True):
        norm1 = LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")
        attn = MultiHeadAttention(
            dim=self.dim,
            heads=self.heads,
            dim_head=self.dim_head,
            fused_qkv=self.fused_qkv,
            causal=self.causal,
            dropout=self.dropout,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_dropout=self.lora_dropout,
            dtype=self.dtype,
            name="attn",
        )
        if pending is None:
            h = attn(norm1(x), key_mask, legacy_query_mask=legacy_query_mask,
                     deterministic=deterministic)
            x = x + h
            h = LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(x)
            h = self._mlp()(h, deterministic=deterministic)
            return x + h
        # Fused-residual wiring (BIFOLD_LN_KERNEL=fused): the caller carries
        # (residual, pending_delta) so every residual add lands inside a
        # LayerNorm kernel pass; returns (s2, mlp_out) for the next block.
        s1, n1 = norm1(x, residual=pending)
        a = attn(n1, key_mask, legacy_query_mask=legacy_query_mask,
                 deterministic=deterministic)
        s2, n2 = LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                           name="norm2")(s1, residual=a)
        m = self._mlp()(n2, deterministic=deterministic)
        return s2, m


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _unstack(depth, v):
    """Split a depth-stacked array into per-layer slices with a transpose
    that writes the stacked cotangent ONCE.

    Plain indexing (``v[i]``) — and lax.scan's unrolled AD — transpose to a
    dynamic-update-slice CHAIN on the stacked gradient buffer; profiled on
    v5e (r5, BENCH_NOTES.md) each link copies the ENTIRE buffer (~0.17 ms
    for the (8, 3072, 768) fusion-MLP grads), ~3.3 ms/step of pure copy at
    the flagship shape. ``jnp.stack`` lowers to one concatenate that writes
    each slice exactly once. Applied PER LEAF so frozen stacked kernels
    (constants under partitioned gradients) stay off the AD path entirely.
    """
    return tuple(v[i] for i in range(depth))


def _unstack_fwd(depth, v):
    return _unstack(depth, v), None


def _unstack_bwd(depth, _, cts):
    return (jnp.stack(cts),)


_unstack.defvjp(_unstack_fwd, _unstack_bwd)


class _ScanBody(nn.Module):
    """One block as a scan step: carry = activations, per-step params.

    ``deterministic`` rides as a static module attribute, not a scan operand
    — under remat a scanned operand turns into a tracer and Python branches
    (flax Dropout) would raise TracerBoolConversionError."""

    block_kwargs: Any
    remat: bool = False
    deterministic: bool = True
    fused_residual: bool = False

    @nn.compact
    def __call__(self, carry, key_mask, legacy_query_mask):
        block = TransformerBlock(**dict(self.block_kwargs), name="block")
        det = self.deterministic
        if self.fused_residual:
            x, pending = carry
            if self.remat:
                def body_fn(mdl, xx, pp, km, lqm):
                    return mdl(xx, km, pending=pp, legacy_query_mask=lqm,
                               deterministic=det)

                s, m = nn.remat(body_fn)(block, x, pending, key_mask,
                                         legacy_query_mask)
            else:
                s, m = block(x, key_mask, pending=pending,
                             legacy_query_mask=legacy_query_mask,
                             deterministic=det)
            return (s, m), None
        x = carry
        if self.remat:
            def body_fn(mdl, xx, km, lqm):
                return mdl(xx, km, legacy_query_mask=lqm, deterministic=det)

            x = nn.remat(body_fn)(block, x, key_mask, legacy_query_mask)
        else:
            x = block(x, key_mask, legacy_query_mask=legacy_query_mask,
                      deterministic=det)
        return x, None


class Transformer(nn.Module):
    """Stack of pre-norm blocks (reference transformer.py:45-64).

    ``scan_layers`` (default) runs the depth as one ``nn.scan`` over stacked
    per-layer parameters — the XLA program contains each tower's block once
    instead of ``depth`` times, cutting compile time ~depth-fold on the big
    models (the TPU-native choice for homogeneous stacks). ``remat`` wraps
    each block in jax.checkpoint to trade FLOPs for HBM; it composes with
    scan. With ``scan_layers=False`` blocks unroll under names ``block_i``
    (the layout tests/goldens address individual layers through).
    """

    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dim_head: Optional[int] = None
    fused_qkv: bool = True
    causal: bool = False
    dropout: float = 0.0
    activation: Callable = gelu_exact
    lora_rank: int = 0
    lora_alpha: float = 1.0
    lora_dropout: float = 0.0
    ln_eps: float = 1e-6
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    remat: bool = False
    scan_layers: bool = True
    dtype: Any = jnp.float32

    def _block_kwargs(self):
        return dict(
            dim=self.dim, heads=self.heads, mlp_dim=self.mlp_dim,
            dim_head=self.dim_head, fused_qkv=self.fused_qkv,
            causal=self.causal, dropout=self.dropout,
            activation=self.activation, lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha, lora_dropout=self.lora_dropout,
            ln_eps=self.ln_eps, moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor, dtype=self.dtype)

    def _maybe_pipeline(self, x, key_mask, legacy_query_mask, deterministic,
                        fused_res):
        """Pipeline-parallel execution (GPipe) of the stack when the active
        mesh (parallel.set_active_mesh — wired from ``mesh.pp`` in config)
        carries a ``pp`` axis dividing ``depth``.

        The depth-stacked scan params ARE the stage sharding
        (parallel/pipeline.py): this method reads the same ``blocks/block``
        stacked leaves the scan path trains/checkpoints — layout identical
        either way — and drives :func:`parallel.gpipe` with one
        TransformerBlock apply per layer. Per-sample attention masks ride
        the activation carry so each microbatch travels with its own mask.
        Returns None (caller falls through to the scan/unrolled path) at
        init time, when pp is off, when depth doesn't divide, or for the
        fused-residual / MoE wirings (MoE needs the sown aux loss, which a
        shard_map body cannot sow). Dropout note: per-LAYER rng keys thread
        through the stacked tree, but microbatches of one layer share a key
        (masks correlate across microbatches — acceptable statistically,
        not bit-equal to the scan path; dropout-free configs ARE exact)."""
        import jax as _jax

        from bifold_tpu import parallel

        pp = parallel.active_axis_size("pp")
        if (pp <= 1 or not self.scan_layers or self.depth <= 1
                or self.depth % pp or fused_res or self.moe_experts > 0
                or self.is_initializing()):
            return None
        # masks ride the microbatch carry — they must share x's batch dim
        # (a broadcast-shaped mask falls back to the scan path)
        for mask in (key_mask, legacy_query_mask):
            if mask is not None and mask.shape[0] != x.shape[0]:
                return None
        blocks = self.get_variable("params", "blocks")
        if not blocks or "block" not in blocks:
            return None
        stacked = dict(blocks["block"])
        det = bool(deterministic)
        needs_rng = (not det
                     and (self.dropout > 0 or self.lora_dropout > 0)
                     and self.has_rng("dropout"))
        if needs_rng:
            keys = _jax.random.split(self.make_rng("dropout"), self.depth)
            stacked["__rng"] = _jax.random.key_data(keys)

        # parent=None: used only via functional .apply with explicit params
        # — must NOT register as a child of this module (name/param clash
        # with the scan-created "blocks" collection)
        block = TransformerBlock(**self._block_kwargs(), parent=None)

        def body(p, carry):
            p = dict(p)
            rngs = None
            if "__rng" in p:
                rngs = {"dropout": _jax.random.wrap_key_data(p.pop("__rng"))}
            h, km, lqm = carry
            h = block.apply({"params": p}, h, km, legacy_query_mask=lqm,
                            deterministic=det, rngs=rngs)
            return (h, km, lqm)

        if self.remat:
            body = _jax.checkpoint(body)
        mesh = parallel.active_mesh()
        batch = x.shape[0]
        m = parallel.active_pp_microbatches()
        if m <= 0:
            import math
            m = math.gcd(batch, 2 * pp)  # bubble (pp-1)/(m+pp-1), batch | m
        out, _, _ = parallel.gpipe(
            body, stacked, (x, key_mask, legacy_query_mask),
            mesh=mesh, microbatches=m)
        return out

    def _explicit_unroll(self, x, key_mask, legacy_query_mask, deterministic,
                         fused_res):
        """Fully-unrolled execution WITHOUT lax.scan: reads the same
        ``blocks/block`` depth-stacked params the scan path trains and
        checkpoints (layout identical either way) and loops blocks in
        Python, with each stacked leaf split through :func:`_unstack` so the
        backward writes stacked gradients once instead of through the
        DUS-copy chain lax.scan's unrolled AD emits. MEASURED r5 (v5e,
        BENCH_NOTES.md) and DEFAULTED OFF: the chain's bytes halve (XLA
        commutes the stack with the bf16 convert) but step time is neutral
        — train 74.06 vs 74.41 ms (+0.5%, within ±6% tunnel noise), device
        busy 71.9 vs 72.2 ms — the DUS copies overlap with compute; and
        forward-only programs are WORSE (serve on-chip 3.578 vs 3.296 ms,
        +8.5%, reproduced twice same-process). Returns None (caller falls
        through to nn.scan) unless BIFOLD_UNROLL_IMPL=explicit, at init
        time, or for MoE blocks (per-layer sown aux losses).

        Dropout note: per-layer keys come from one jax.random.split, which
        is not bit-equal to nn.scan's split_rngs stream — same
        distribution, different masks. Deterministic passes are exact."""
        import os
        if (self.moe_experts > 0 or self.is_initializing()
                or os.environ.get("BIFOLD_UNROLL_IMPL", "scan") != "explicit"):
            return None
        blocks = self.get_variable("params", "blocks")
        if not blocks or "block" not in blocks:
            return None
        stacked = blocks["block"]
        depth = self.depth
        unstacked = jax.tree_util.tree_map(
            lambda v: _unstack(depth, v), stacked)
        is_tup = lambda t: isinstance(t, tuple)  # noqa: E731
        layers = [jax.tree_util.tree_map(lambda t: t[i], unstacked,
                                         is_leaf=is_tup)
                  for i in range(depth)]
        det = bool(deterministic)
        needs_rng = (not det
                     and (self.dropout > 0 or self.lora_dropout > 0)
                     and self.has_rng("dropout"))
        keys = (jax.random.split(self.make_rng("dropout"), depth)
                if needs_rng else [None] * depth)
        # parent=None: functional .apply with explicit params (same pattern
        # as _maybe_pipeline) — must not register as a child module
        block = TransformerBlock(**self._block_kwargs(), parent=None)

        def apply_block(p, carry, rng):
            rngs = {"dropout": rng} if rng is not None else None
            if fused_res:
                xx, pending = carry
                s, m = block.apply({"params": p}, xx, key_mask,
                                   pending=pending,
                                   legacy_query_mask=legacy_query_mask,
                                   deterministic=det, rngs=rngs)
                return (s, m)
            return block.apply({"params": p}, carry, key_mask,
                               legacy_query_mask=legacy_query_mask,
                               deterministic=det, rngs=rngs)

        if self.remat:
            apply_block = jax.checkpoint(apply_block)
        carry = (x, jnp.zeros_like(x)) if fused_res else x
        for i in range(depth):
            carry = apply_block(layers[i], carry, keys[i])
        if fused_res:
            s, m = carry
            return s + m
        return carry

    @nn.compact
    def __call__(self, x, key_mask=None, *, legacy_query_mask=None, deterministic=True):
        from bifold_tpu.ops.layer_norm import ln_mode

        # Fused-residual wiring (BIFOLD_LN_KERNEL=fused, trace-time): the
        # stack carries (residual, pending_delta) and both per-block adds
        # ride the LayerNorm kernel passes; one add survives at the end.
        # Param/checkpoint layout is IDENTICAL to the standard wiring.
        fused_res = ln_mode() == "fused"
        pp_out = self._maybe_pipeline(x, key_mask, legacy_query_mask,
                                      deterministic, fused_res)
        if pp_out is not None:
            return pp_out
        if self.scan_layers and self.depth > 1:
            # Unroll policy (BIFOLD_SCAN_UNROLL overrides; read at trace
            # time). The stacked param layout / checkpoint format is
            # IDENTICAL either way — unroll is lax.scan codegen only.
            # Measured on v5e (BENCH_NOTES r3): FULL unroll takes the
            # flagship step 89.3 -> 83.2 ms (loop carries + stacked-slice
            # DUS overhead gone), while PARTIAL unroll pessimizes badly
            # (107 ms at 4-of-8). On CPU (the test suite's 1-core host)
            # the rolled loop keeps compile times depth-fold smaller.
            import os
            env = os.environ.get("BIFOLD_SCAN_UNROLL")
            if env:
                unroll = max(1, min(int(env), self.depth))
            else:
                on_tpu = jax.default_backend() in ("tpu", "axon")
                unroll = self.depth if on_tpu else 1
            if unroll == self.depth:
                # full unroll without lax.scan — same stacked param layout,
                # single-write stacked gradients. A/B'd NEUTRAL for train
                # and worse for serve, so opt-in only (BIFOLD_UNROLL_IMPL=
                # explicit; see _explicit_unroll + BENCH_NOTES.md)
                out = self._explicit_unroll(x, key_mask, legacy_query_mask,
                                            deterministic, fused_res)
                if out is not None:
                    return out
            scan = nn.scan(
                _ScanBody,
                # moe_losses: per-layer sown load-balance scalars stack over
                # the depth axis (declared unconditionally; absent when the
                # block has no MoE)
                variable_axes={"params": 0, "moe_losses": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.depth,
                in_axes=(nn.broadcast, nn.broadcast),
                unroll=unroll,
            )
            body = scan(block_kwargs=tuple(self._block_kwargs().items()),
                        remat=self.remat, deterministic=bool(deterministic),
                        fused_residual=fused_res, name="blocks")
            if fused_res:
                (s, m), _ = body((x, jnp.zeros_like(x)), key_mask,
                                 legacy_query_mask)
                return s + m
            x, _ = body(x, key_mask, legacy_query_mask)
            return x
        det = bool(deterministic)
        pending = jnp.zeros_like(x) if fused_res else None
        for i in range(self.depth):
            block = TransformerBlock(**self._block_kwargs(), name=f"block_{i}")
            if fused_res:
                if self.remat:
                    def body_fn(mdl, xx, pp, km, lqm, _det=det):
                        return mdl(xx, km, pending=pp, legacy_query_mask=lqm,
                                   deterministic=_det)

                    x, pending = nn.remat(body_fn)(block, x, pending,
                                                   key_mask, legacy_query_mask)
                else:
                    x, pending = block(x, key_mask, pending=pending,
                                       legacy_query_mask=legacy_query_mask,
                                       deterministic=det)
            elif self.remat:
                def body_fn(mdl, xx, km, lqm, _det=det):
                    return mdl(xx, km, legacy_query_mask=lqm, deterministic=_det)

                x = nn.remat(body_fn)(block, x, key_mask, legacy_query_mask)
            else:
                x = block(x, key_mask, legacy_query_mask=legacy_query_mask,
                          deterministic=det)
        return x + pending if fused_res else x


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False):
    """Frozen 2-D sin-cos positional embedding (MAE-style; reference
    models/utils.py:5-54). Returns (P[+1], D) float32 numpy."""
    assert embed_dim % 2 == 0

    def one_dim(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first, like the reference
    emb = np.concatenate(
        [one_dim(embed_dim // 2, grid[0]), one_dim(embed_dim // 2, grid[1])], axis=1
    )
    if cls_token:
        emb = np.concatenate([np.zeros((1, embed_dim)), emb], axis=0)
    return emb.astype(np.float32)

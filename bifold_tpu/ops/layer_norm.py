"""Pallas TPU LayerNorm: bandwidth-roofline forward and backward.

Profiling the flagship step (tools/profile_step.py, round 3) showed XLA's
LayerNorm lowering far off the HBM roofline in BOTH directions:

- forward: the ``convert_reduce_fusion`` ops producing (mean, rstd, out) for
  the (2, 2373, 768) fusion-layer LNs ran ~230 us each (~30 GB/s effective —
  ~25x off v5e's ~819 GB/s) — 4.3 ms/step across the towers;
- backward: the dscale/dbias token-dim (major-axis) reductions were ~5x off
  the roofline (round-3 audit: ~7 ms/step of LN/bias-grad reductions, "no
  known XLA-level fix").

These kernels stream each row-block tile exactly once per direction:

- forward: one grid axis over row blocks; per step read an (R, C) tile,
  compute row mean/rstd on the VPU (lane-axis reductions, which Mosaic
  lowers well), write the normalized output tile and the (1, R) stats.
- backward: read x/dy tiles, recompute xhat from the saved stats, write the
  dx tile, and accumulate dscale/dbias into (1, C) float32 output blocks
  whose index map ignores the grid axis — Pallas keeps them VMEM-resident
  across the row-block steps (the flash kernel's dk/dv accumulator trick,
  ops/flash_attention.py), so the major-axis reduction costs one elementwise
  add per tile instead of XLA's strided passes.

Used by models.layers.LayerNorm through its custom VJP: the public
``_layer_norm`` semantics, residual format, and checkpoint layout are
unchanged — this is a backend swap, selected per-call, opt-in with
``BIFOLD_LN_KERNEL=pallas`` and testable on CPU via
``BIFOLD_LN_INTERPRET=1`` (drives the real kernels in interpret mode).

MEASURED AND DEFAULTED OFF (round 3, real v5e chip, tools/profile_step.py):
the kernels themselves win exactly as predicted — the LN op time drops
4.30 -> 1.55 ms/step (the ``norm`` custom-calls replace every
``convert_reduce_fusion``) — but the pallas-call boundary un-fuses what XLA
had folded into those same passes: the residual adds reappear as standalone
``add_add_fusion`` ops (+1.8 ms), neighboring fusions grow (+1.5 ms), and
row-padding glue adds ~+0.9 ms. Net step time 81.2 -> 82.5 ms (bench
23.55 -> 23.18 samples/s). Same lesson as the reverted upsample stencil
(CLAUDE.md): at bandwidth-bound shapes, beating XLA's *op* is not enough —
you must also replace everything XLA fused around it.

The FUSED variant (``BIFOLD_LN_KERNEL=fused``) goes after exactly that
delta: ``fused_ln_forward`` computes the pre-norm block's residual add
*inside* the kernel (s = x + delta; y = LN(s)) and the backward folds the
downstream residual cotangent into the same streaming pass (ds_total =
ds_out + dLN/ds), so the adds that reappeared as standalone fusions ride
the bandwidth the kernel already pays. models/layers.py rewires the
transformer carry to (residual, pending_delta) under this lever — see
``TransformerBlock.__call__`` — with the param/checkpoint layout unchanged.

ALSO MEASURED, ALSO DEFAULTED OFF (round 3, same method): fused mode is
82.9 ms/step device busy vs 81.2 default (pallas-only 82.5). Moving the
residual adds into the kernel does NOT reclaim the gap — XLA's default
lowering was already fusing those adds into its convert_reduce_fusion LN
passes, so the fused kernel merely matches XLA's own fusion while still
paying the pallas-boundary costs around every other neighbor (grown
fusions, row-pad glue). Net conclusion for this architecture/shape: XLA's
fused LN neighborhood is the fastest known lowering; both kernel modes
stay opt-in levers with CPU interpret-mode tests.

Note on the token-dim reductions more broadly (tools/reduce_bench.py,
measured round 3): in isolation XLA's major-axis ``sum(dy, axis=0)``
already runs at the HBM roofline (~710 GB/s f32 at (4746, 3072)) and an
MXU ``ones @ dy`` reduction is time-identical — the 5x-off behavior in the
full step is a fusion-context effect, not the reduce op itself, so there
is no win in rewriting dbias reductions as matmuls.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ln_forward", "ln_backward", "use_pallas_ln", "ln_mode",
           "fused_ln_forward", "fused_ln_backward"]

_BLOCK_R = 256


def _flag(name):
    return os.environ.get(name, "").lower() not in ("", "0", "false")


_warned_multichip = False


def ln_mode() -> str:
    """'' (XLA default), 'pallas' (kernel LN only), or 'fused' (kernel LN
    with in-kernel residual adds — see module docstring)."""
    mode = os.environ.get("BIFOLD_LN_KERNEL", "").lower()
    mode = mode if mode in ("pallas", "fused") else ""
    if mode:
        # unlike the flash kernels, these have NO custom_partitioning: under
        # a sharded jit XLA replicates the opaque custom-call, all-gathering
        # the full activations on every device — warn loudly; the levers are
        # single-chip measured only
        global _warned_multichip
        if not _warned_multichip:
            _warned_multichip = True
            import jax
            if jax.device_count() > 1:
                import warnings
                warnings.warn(
                    f"BIFOLD_LN_KERNEL={mode}: the Pallas LayerNorm kernels "
                    "carry no SPMD partitioning rule — under a sharded jit "
                    "they replicate with full-activation all-gathers. "
                    "Single-chip lever only; unset for multi-chip runs.")
    return mode


def use_pallas_ln(c: int) -> bool:
    """Opt-in via BIFOLD_LN_KERNEL=pallas|fused (default: XLA path —
    measured faster end-to-end; see module docstring). C must tile the
    128-lane dim exactly (C % 128 != 0 always falls back — e.g. 192-wide
    decoder LNs)."""
    if c % 128:
        return False
    return ln_mode() != ""


def _interpret():
    return _flag("BIFOLD_LN_INTERPRET")


def _pad_rows(x2, block_r):
    r = x2.shape[0]
    pad = (-r) % block_r
    return (jnp.pad(x2, ((0, pad), (0, 0))) if pad else x2), r


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, scale_ref, bias_ref, o_ref, mean_ref, rstd_ref, *,
                eps):
    x = x_ref[...].astype(jnp.float32)                       # (R, C)
    mean = jnp.mean(x, axis=1, keepdims=True)
    # fast variance (matches flax use_fast_variance): E[x^2] - E[x]^2
    var = jnp.maximum(jnp.mean(x * x, axis=1, keepdims=True) - mean * mean,
                      0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = (x - mean) * rstd
    o_ref[...] = (y * scale_ref[...].astype(jnp.float32)
                  + bias_ref[...].astype(jnp.float32)).astype(o_ref.dtype)
    mean_ref[0, :] = mean[:, 0]
    rstd_ref[0, :] = rstd[:, 0]


def ln_forward(x, scale, bias, eps, block_r: int = _BLOCK_R):
    """(..., C) -> (out (..., C) [x.dtype], mean (..., 1) f32, rstd (..., 1)
    f32). One streaming pass; stats match the XLA path bit-for-bit up to
    reduction order."""
    lead, c = x.shape[:-1], x.shape[-1]
    x2, r = _pad_rows(x.reshape(-1, c), block_r)
    r_pad = x2.shape[0]
    grid = (r_pad // block_r,)

    out, mean, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_r, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, c), x.dtype),
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
        ),
        interpret=_interpret(),
    )(x2, scale.reshape(1, c), bias.reshape(1, c))
    return (out[:r].reshape(*lead, c),
            mean[0, :r].reshape(*lead, 1),
            rstd[0, :r].reshape(*lead, 1))


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_kernel(x_ref, dy_ref, mean_ref, rstd_ref, scale_ref,
                dx_ref, dsc_ref, dbi_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dsc_ref[...] = jnp.zeros_like(dsc_ref)
        dbi_ref[...] = jnp.zeros_like(dbi_ref)

    x = x_ref[...].astype(jnp.float32)                       # (R, C)
    dy = dy_ref[...].astype(jnp.float32)
    mean = mean_ref[0, :][:, None]
    rstd = rstd_ref[0, :][:, None]
    xhat = (x - mean) * rstd
    # dscale/dbias: the major-axis (token) reduction, accumulated across
    # grid steps in the VMEM-resident (1, C) f32 out-blocks (padded rows
    # carry dy == 0, so they contribute nothing)
    dsc_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbi_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dxhat = dy * scale_ref[...].astype(jnp.float32)
    dx = rstd * (dxhat
                 - jnp.mean(dxhat, axis=1, keepdims=True)
                 - xhat * jnp.mean(dxhat * xhat, axis=1, keepdims=True))
    dx_ref[...] = dx.astype(dx_ref.dtype)


def ln_backward(x, dy, mean, rstd, scale, block_r: int = _BLOCK_R):
    """Gradients (dx (..., C) [x.dtype], dscale (C,) f32, dbias (C,) f32)
    from the saved input and row stats."""
    lead, c = x.shape[:-1], x.shape[-1]
    x2, r = _pad_rows(x.reshape(-1, c), block_r)
    dy2, _ = _pad_rows(dy.reshape(-1, c), block_r)
    stats_pad = (-r) % block_r
    mean2 = jnp.pad(mean.reshape(1, -1), ((0, 0), (0, stats_pad)))
    rstd2 = jnp.pad(rstd.reshape(1, -1), ((0, 0), (0, stats_pad)))
    r_pad = x2.shape[0]
    grid = (r_pad // block_r,)

    dx, dsc, dbi = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_r, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # index map ignores the grid axis -> VMEM-resident accumulators
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        interpret=_interpret(),
    )(x2, dy2, mean2, rstd2, scale.reshape(1, c))
    return dx[:r].reshape(*lead, c), dsc[0], dbi[0]


# ---------------------------------------------------------------------------
# Fused residual-add + LayerNorm
# ---------------------------------------------------------------------------


def _fused_fwd_kernel(x_ref, d_ref, scale_ref, bias_ref,
                      s_ref, o_ref, mean_ref, rstd_ref, *, eps):
    # s is rounded to the residual-stream dtype BEFORE the stats so the
    # normalized output matches the unfused wiring (XLA adds in the compute
    # dtype, then LN upcasts) bit-for-bit up to reduction order.
    sf = x_ref[...].astype(jnp.float32) + d_ref[...].astype(jnp.float32)
    s = sf.astype(s_ref.dtype)
    s_ref[...] = s
    x = s.astype(jnp.float32)
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=1, keepdims=True) - mean * mean,
                      0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = (x - mean) * rstd
    o_ref[...] = (y * scale_ref[...].astype(jnp.float32)
                  + bias_ref[...].astype(jnp.float32)).astype(o_ref.dtype)
    mean_ref[0, :] = mean[:, 0]
    rstd_ref[0, :] = rstd[:, 0]


def fused_ln_forward(x, delta, scale, bias, eps, block_r: int = _BLOCK_R):
    """(..., C) x 2 -> (s = x + delta [x.dtype], out = LN(s) [x.dtype],
    mean (..., 1) f32, rstd (..., 1) f32) in one streaming pass."""
    lead, c = x.shape[:-1], x.shape[-1]
    x2, r = _pad_rows(x.reshape(-1, c), block_r)
    d2, _ = _pad_rows(delta.reshape(-1, c), block_r)
    r_pad = x2.shape[0]
    grid = (r_pad // block_r,)

    row_spec = pl.BlockSpec((block_r, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    par_spec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, block_r), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    s, out, mean, rstd = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[row_spec, row_spec, par_spec, par_spec],
        out_specs=(row_spec, row_spec, stat_spec, stat_spec),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, c), x.dtype),
            jax.ShapeDtypeStruct((r_pad, c), x.dtype),
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
        ),
        interpret=_interpret(),
    )(x2, d2, scale.reshape(1, c), bias.reshape(1, c))
    return (s[:r].reshape(*lead, c), out[:r].reshape(*lead, c),
            mean[0, :r].reshape(*lead, 1), rstd[0, :r].reshape(*lead, 1))


def _fused_bwd_kernel(s_ref, dy_ref, ds_ref, mean_ref, rstd_ref, scale_ref,
                      dx_ref, dsc_ref, dbi_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dsc_ref[...] = jnp.zeros_like(dsc_ref)
        dbi_ref[...] = jnp.zeros_like(dbi_ref)

    x = s_ref[...].astype(jnp.float32)                       # (R, C)
    dy = dy_ref[...].astype(jnp.float32)
    mean = mean_ref[0, :][:, None]
    rstd = rstd_ref[0, :][:, None]
    xhat = (x - mean) * rstd
    dsc_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbi_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dxhat = dy * scale_ref[...].astype(jnp.float32)
    dx = rstd * (dxhat
                 - jnp.mean(dxhat, axis=1, keepdims=True)
                 - xhat * jnp.mean(dxhat * xhat, axis=1, keepdims=True))
    # fold the downstream residual-stream cotangent into the same pass
    dx_ref[...] = (dx + ds_ref[...].astype(jnp.float32)).astype(dx_ref.dtype)


def fused_ln_backward(s, dy, ds_out, mean, rstd, scale,
                      block_r: int = _BLOCK_R):
    """Backward of fused_ln_forward: ds_total = ds_out + dLN(s)/ds · dy
    (the gradient w.r.t. BOTH x and delta), plus (dscale, dbias) f32."""
    lead, c = s.shape[:-1], s.shape[-1]
    s2, r = _pad_rows(s.reshape(-1, c), block_r)
    dy2, _ = _pad_rows(dy.reshape(-1, c), block_r)
    ds2, _ = _pad_rows(ds_out.reshape(-1, c), block_r)
    stats_pad = (-r) % block_r
    mean2 = jnp.pad(mean.reshape(1, -1), ((0, 0), (0, stats_pad)))
    rstd2 = jnp.pad(rstd.reshape(1, -1), ((0, 0), (0, stats_pad)))
    r_pad = s2.shape[0]
    grid = (r_pad // block_r,)

    row_spec = pl.BlockSpec((block_r, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    par_spec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, block_r), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    dx, dsc, dbi = pl.pallas_call(
        _fused_bwd_kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, stat_spec, stat_spec,
                  par_spec],
        out_specs=(
            row_spec,
            # index map ignores the grid axis -> VMEM-resident accumulators
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, c), s.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        interpret=_interpret(),
    )(s2, dy2, ds2, mean2, rstd2, scale.reshape(1, c))
    return dx[:r].reshape(*lead, c), dsc[0], dbi[0]

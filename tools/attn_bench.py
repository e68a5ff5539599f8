"""Microbenchmark: flash-attention fwd/bwd per call on the real TPU.

Times the two flagship shapes (fusion stack and vision tower) by chaining K
calls in a lax.scan (a data dependency defeats CSE; per-call time =
total / K). Over the tunneled runtime a host readback is the only honest
sync, so each measurement reads a scalar.

Usage: python tools/attn_bench.py [fusion|vision|vision_split|all]
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SHAPES = {
    # flagship bimanual 384: fused seq = 65 text + 3*577 ctx + 577 cur
    "fusion": dict(b=2, n=2373, h=16, d=48),
    # vision tower with current+context frames batched together (B*(T+1))
    "vision": dict(b=8, n=576, h=12, d=64),
    # vision tower as the model currently runs it: current then context
    "vision_cur": dict(b=2, n=576, h=12, d=64),
    "vision_ctx": dict(b=6, n=576, h=12, d=64),
}

K = 20  # chained calls per measurement


def make_inputs(b, n, h, d, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), dtype)
    mask = jnp.asarray(rng.random((b, n)) > 0.1, jnp.int32)
    return q, k, v, mask


def timed(fn, *args, reps=3):
    out = fn(*args)
    float(out)  # warmup + compile; readback is the honest barrier
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(fn(*args))
        best = min(best, time.time() - t0)
    return best / K * 1e3  # ms per call


def bench_fn(attn, grad: bool):
    """attn(q, k, v, mask) -> (b, n, h, d). Chained K times."""

    def chain(q, k, v, mask):
        def body(c, _):
            o = attn(c, k, v, mask)
            return (c + 0.001 * o).astype(c.dtype), ()

        c, _ = jax.lax.scan(body, q, None, length=K)
        return jnp.sum(c.astype(jnp.float32))

    if grad:
        return jax.jit(jax.grad(chain, argnums=(0, 1, 2)))
    return jax.jit(chain)


def timed_grad(fn, *args, reps=3):
    outs = fn(*args)
    jax.block_until_ready(outs)
    float(jnp.sum(outs[0][0, 0, 0, :].astype(jnp.float32)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        outs = fn(*args)
        float(jnp.sum(outs[0][0, 0, 0, :].astype(jnp.float32)))
        best = min(best, time.time() - t0)
    return best / K * 1e3


def run(name, attn=None, label=""):
    import os
    from bifold_tpu.ops.flash_attention import flash_attention

    bq = os.environ.get("ATTN_BLOCK_Q")  # unset -> kernel defaults
    kw = {"block_q": int(bq)} if bq else {}
    if attn is None:
        attn = lambda q, k, v, m: flash_attention(q, k, v, key_mask=m, **kw)
    cfg = SHAPES[name]
    q, k, v, mask = make_inputs(**cfg)
    fwd_ms = timed(bench_fn(attn, grad=False), q, k, v, mask)
    bwd_ms = timed_grad(bench_fn(attn, grad=True), q, k, v, mask)
    print(f"{name:12s} {label:10s} b={cfg['b']} n={cfg['n']} h={cfg['h']} "
          f"d={cfg['d']}  fwd {fwd_ms:7.3f} ms  fwd+bwd {bwd_ms:7.3f} ms")
    return fwd_ms, bwd_ms


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"platform={jax.default_backend()} devices={len(jax.devices())}")
    names = ["fusion", "vision", "vision_cur", "vision_ctx"] \
        if which == "all" else [which]
    for name in names:
        run(name)


if __name__ == "__main__":
    main()

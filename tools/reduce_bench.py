"""Microbenchmark: major-axis (token-dim) reductions on the real TPU.

The round-3 per-op audit (CLAUDE.md) found the flagship step's LN/bias-grad
token-dim reductions ~5x off the HBM bandwidth roofline — XLA lowers
``sum(dy, axis=0)`` over the MAJOR axis as strided passes. The MXU can do the
same reduction as ``ones(1, R) @ dy`` at matmul input bandwidth. This bench
times the candidate lowerings at the flagship dbias/dscale shapes so the
choice in models/layers.py is measured, not guessed.

Variants per (R, C) shape and dtype:
  red   jnp.sum(dy, axis=0)                      (XLA reduce)
  mat   ones(1, R) @ dy                          (MXU reduction)
  scale jnp.sum(dy * xhat, axis=0)               (LN dscale: product+reduce)
  scmat ones(1, R) @ (dy * xhat)                 (product then MXU reduce)

Usage: python tools/reduce_bench.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 500  # chained calls per measurement (amortizes the ~30 ms tunnel RTT)

# (rows, cols): fusion stack BT=2*2373, vision BT=8*576; fc1 out 3072,
# model dim 768, fused qkv 2304
SHAPES = [(4746, 3072), (4746, 768)]


def chain(fn, x, extra=None):
    """Chain K dependent calls; reduction result perturbs the input."""

    def body(c, _):
        r = fn(c) if extra is None else fn(c, extra)
        return (c + 1e-6 * r[None, :].astype(c.dtype)), ()

    def run(x0):
        c, _ = jax.lax.scan(body, x0, None, length=K)
        return jnp.sum(c[0, :].astype(jnp.float32))

    return jax.jit(run)


def timed(fn, *args, reps=3):
    float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(fn(*args))
        best = min(best, time.time() - t0)
    return best / K * 1e6  # us per call


def main():
    rng = np.random.default_rng(0)
    print(f"{'shape':>14} {'dtype':>9} {'red':>8} {'mat':>8} "
          f"{'scale':>8} {'scmat':>8}  (us/call, GB/s effective for red/mat)")
    for r, c in SHAPES:
        for dtype in (jnp.bfloat16, jnp.float32):
            x = jnp.asarray(rng.standard_normal((r, c)), dtype)
            xhat = jnp.asarray(rng.standard_normal((r, c)), dtype)
            ones = jnp.ones((1, r), jnp.float32)

            t_red = timed(chain(lambda y: jnp.sum(y.astype(jnp.float32),
                                                  axis=0), x), x)
            t_mat = timed(chain(
                lambda y: (ones @ y.astype(jnp.float32))[0], x), x)
            t_scale = timed(chain(
                lambda y, h: jnp.sum(y.astype(jnp.float32)
                                     * h.astype(jnp.float32), axis=0),
                x, xhat), x)
            t_scmat = timed(chain(
                lambda y, h: (ones @ (y.astype(jnp.float32)
                                      * h.astype(jnp.float32)))[0],
                x, xhat), x)
            nbytes = r * c * jnp.dtype(dtype).itemsize
            gbs = lambda t: nbytes / (t * 1e-6) / 1e9
            print(f"{(r, c)!s:>14} {jnp.dtype(dtype).name:>9} "
                  f"{t_red:8.1f} {t_mat:8.1f} {t_scale:8.1f} {t_scmat:8.1f}"
                  f"  [{gbs(t_red):.0f} vs {gbs(t_mat):.0f} GB/s]")


if __name__ == "__main__":
    main()

"""Gaussian heatmap target generation — on-device, jittable.

Counterpart of the reference's per-sample numpy meshgrid loop
(/root/reference/bifold/data/processor.py:405-439), redesigned for TPU: a
fixed-size point set with a validity mask replaces data-dependent point
counts, so the whole batch of targets is one fused XLA computation (separable
exp outer products instead of full (H, W) distance grids).

Conventions match the reference: points are ``[x, y]`` = (column, row); the
map's peak lands at ``map[y, x]``. Invalid points are marked by the validity
mask (the reference uses ``(-1, -1)`` dummies).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["gaussmap", "batched_gaussmap"]


def _separable_gauss(points, valid, size, sigma):
    """Sum of unnormalized Gaussians at rounded ``points``, via separable
    row/col factors: exp(-(dx^2+dy^2)/2s^2) = exp(-dx^2/2s^2) * exp(-dy^2/2s^2).

    Returns (size, size); invalid points contribute zero.
    """
    grid = jnp.arange(size, dtype=jnp.float32)
    cx = jnp.rint(points[:, 0])[:, None]  # (N, 1)
    cy = jnp.rint(points[:, 1])[:, None]
    inv = 1.0 / (2.0 * sigma * sigma)
    fx = jnp.exp(-((grid[None, :] - cx) ** 2) * inv)  # (N, W) column factors
    fy = jnp.exp(-((grid[None, :] - cy) ** 2) * inv)  # (N, H) row factors
    fy = fy * valid.astype(fy.dtype)[:, None]
    # (N, H) x (N, W) -> (H, W): one small matmul, MXU-friendly for batches.
    return jnp.einsum("nh,nw->hw", fy, fx)


@partial(jax.jit, static_argnames=("size", "strategy"))
def gaussmap(points, valid, size: int, sigma: float = 5.0, strategy: str = "gmm"):
    """Build one (size, size) float32 target map.

    points: (N, 2) ``[x, y]`` float; valid: (N,) bool. Strategies mirror the
    reference (processor.py:412-438):

    - ``first``: single unnormalized Gaussian at the first valid point
      (peak value 1 at the rounded center).
    - ``gmm``: sum of Gaussians over valid points, renormalized to max 1.
      When <=1 point is valid this reduces to ``first`` (the reference
      switches strategies on ``len(points) > 1``).
    - ``fit``: a single bivariate normal fit (mean/cov) to the valid points,
      evaluated on the grid (reference leaves it un-normalized; we match).

    All-invalid input returns zeros (the reference emits a zero map when no
    target exists, processor.py:408-409).
    """
    points = jnp.asarray(points, jnp.float32).reshape(-1, 2)
    valid = jnp.asarray(valid, bool).reshape(-1)
    n_valid = valid.sum()

    if strategy == "first":
        first_idx = jnp.argmax(valid)  # first True (0 if none; masked below)
        sel_valid = valid & (jnp.arange(points.shape[0]) == first_idx)
        return _separable_gauss(points, sel_valid, size, sigma).astype(jnp.float32)

    if strategy == "gmm":
        # reference: len(points) > 1 -> gmm (sum, /max), else 'first'. With
        # rounded centers both normalize to peak 1 for a single point, so one
        # fused path covers both; we only need the /max guard for zero maps.
        m = _separable_gauss(points, valid, size, sigma)
        peak = jnp.max(m)
        return jnp.where(peak > 0, m / jnp.where(peak > 0, peak, 1.0), m).astype(
            jnp.float32
        )

    if strategy == "fit":
        w = valid.astype(jnp.float32)
        n = jnp.maximum(n_valid.astype(jnp.float32), 1.0)
        mean = (points * w[:, None]).sum(0) / n
        centered = (points - mean) * w[:, None]
        # np.cov with rowvar=False divides by N-1
        cov = centered.T @ centered / jnp.maximum(n - 1.0, 1.0)
        cov = cov + 1e-6 * jnp.eye(2, dtype=jnp.float32)  # degenerate-point guard
        icov = jnp.linalg.inv(cov)
        det = jnp.linalg.det(cov)
        grid = jnp.arange(size, dtype=jnp.float32)
        dx = grid[None, :] - mean[0]  # (1, W) x offsets
        dy = grid[:, None] - mean[1]  # (H, 1) y offsets
        quad = (
            icov[0, 0] * dx**2
            + icov[1, 1] * dy**2
            + (icov[0, 1] + icov[1, 0]) * dx * dy
        )
        m = jnp.exp(-0.5 * quad) / (2.0 * jnp.pi * jnp.sqrt(det))
        return jnp.where(n_valid > 0, m, jnp.zeros_like(m)).astype(jnp.float32)

    raise ValueError(f"Strategy {strategy} not recognized")


def batched_gaussmap(points, valid, size: int, sigma: float = 5.0, strategy: str = "gmm"):
    """vmap of :func:`gaussmap` over a leading batch dim.

    points: (B, N, 2); valid: (B, N) -> (B, size, size).
    """
    fn = partial(gaussmap, size=size, sigma=sigma, strategy=strategy)
    return jax.vmap(fn)(jnp.asarray(points, jnp.float32), jnp.asarray(valid, bool))

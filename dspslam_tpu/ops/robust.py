"""Robust (Huber) reweighting of residual vectors, mask-aware.

Reference semantics (/root/reference/reconstruct/loss_utils.py:236-265):
given scalar residuals r and threshold b, the Huber norm is
``rho(|r|) = |r|^2 if |r| <= b else 2 b |r| - b^2``; the IRLS weight is
``w = sqrt(rho(|r|)) / |r|`` (1 inside the quadratic zone, falling off as
``sqrt(2b/|r|)`` outside), applied as ``r_robust = w * r``. The loss is
``mean(r_robust^2)``.

The TPU version adds an explicit validity mask (padded residual slots get
weight 0 and are excluded from the mean), since every residual block has
a static padded shape.
"""

from __future__ import annotations

import jax.numpy as jnp


def huber_weights(res_norm: jnp.ndarray, b: float) -> jnp.ndarray:
    """IRLS weight per residual: 1 in the quadratic zone, sqrt decay out."""
    res_norm = jnp.abs(res_norm)
    rho = jnp.where(res_norm <= b, res_norm**2, 2.0 * b * res_norm - b * b)
    safe = jnp.where(res_norm == 0.0, 1.0, res_norm)
    return jnp.where(res_norm == 0.0, 1.0, jnp.sqrt(jnp.maximum(rho, 0.0)) / safe)


def robust_residuals(res: jnp.ndarray, b: float, mask: jnp.ndarray | None = None):
    """Huber-reweight residuals; returns (robust_res, loss, weights).

    res:  (...,) scalar residuals (any shape).
    mask: same shape, 1.0 for live residuals, 0.0 for padding. The loss is
          the mean of squared robust residuals over live entries only,
          matching the reference's `get_robust_res` on unpadded arrays.
    """
    w = huber_weights(jnp.abs(res), b)
    if mask is not None:
        w = w * mask
    robust = w * res
    if mask is None:
        loss = jnp.mean(robust**2)
    else:
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        loss = jnp.sum(robust**2) / denom
    return robust, loss, w

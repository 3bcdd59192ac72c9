"""Differential operators with the reference's exact border handling.

Reference: lib/tvl1flow/mask.c — backward-difference divergence (:43-92),
forward gradient (:101-144), centered gradient (:152-209).  All vectorized
(H, W) -> (H, W) jnp ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def forward_gradient(f: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """fx = f[:, j+1] - f[:, j] (last col 0); fy likewise along rows."""
    fx = jnp.concatenate([f[:, 1:] - f[:, :-1], jnp.zeros_like(f[:, :1])], axis=1)
    fy = jnp.concatenate([f[1:] - f[:-1], jnp.zeros_like(f[:1])], axis=0)
    return fx, fy


def centered_gradient(f: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """0.5 (f[i+1] - f[i-1]) with one-sided halves at the borders.

    The reference computes 0.5*(f[1]-f[0]) style differences at borders
    (mask.c:172-208); identical to central differences on an edge-replicated
    pad.
    """
    fp = jnp.pad(f, ((1, 1), (1, 1)), mode="edge")
    dx = 0.5 * (fp[1:-1, 2:] - fp[1:-1, :-2])
    dy = 0.5 * (fp[2:, 1:-1] - fp[:-2, 1:-1])
    return dx, dy


def divergence(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Backward-difference divergence, adjoint of forward_gradient.

    Border rule (mask.c:68-91): first col/row uses the value itself, last
    col/row uses MINUS the previous value (because forward_gradient zeroes
    the last difference).
    """
    v1x = jnp.concatenate(
        [v1[:, :1], v1[:, 1:-1] - v1[:, :-2], -v1[:, -2:-1]], axis=1
    )
    v2y = jnp.concatenate([v2[:1], v2[1:-1] - v2[:-2], -v2[-2:-1]], axis=0)
    return v1x + v2y

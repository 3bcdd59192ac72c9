"""Divergence-threshold occlusion detector.

The pipeline marks pixels occluded where the backward-difference flow
divergence exceeds a threshold — the plambda expression
"x(0,0)[0] x(-1,0)[0] - x(0,0)[1] x(0,-1)[1] - + fabs TH > 255 *"
(scripts/nlkalman-seq.sh:69-72, threshold 0.75 by default).  Border pixels
use edge clamping (difference 0), like plambda's default extrapolation.
"""

from __future__ import annotations

import jax.numpy as jnp


def occlusion_mask(flow: jnp.ndarray, threshold: float = 0.75) -> jnp.ndarray:
    """(H, W, 2) flow -> (H, W) float mask, 255.0 where occluded else 0."""
    u, v = flow[..., 0], flow[..., 1]
    du = jnp.concatenate([jnp.zeros_like(u[:, :1]), u[:, 1:] - u[:, :-1]], axis=1)
    dv = jnp.concatenate([jnp.zeros_like(v[:1]), v[1:] - v[:-1]], axis=0)
    div = du + dv
    return jnp.where(jnp.abs(div) > threshold, 255.0, 0.0).astype(flow.dtype)

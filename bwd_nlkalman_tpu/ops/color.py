"""Opponent color transform.

The reference applies an RGB -> opponent (Y,U,V) rotation before filtering
and the inverse after (rgb2opp/opp2rgb, src/nlkalman.c:92-130).  The
transform is orthogonal up to channel scaling, so white Gaussian noise stays
white with the same sigma per channel.

Images are channels-last float arrays (..., H, W, C).  For C != 3 the
transform is the identity, like the reference.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_A = 1.0 / math.sqrt(3.0)
_B = 1.0 / math.sqrt(2.0)
_C = 2.0 * _A * math.sqrt(2.0)

# forward matrix rows: Y, U, V  (applied to [R, G, B])
_FWD = [
    [_A, _A, _A],
    [_B, 0.0, -_B],
    [0.25 * _C, -0.5 * _C, 0.25 * _C],
]
# inverse (reference opp2rgb uses c = a/b and 0.5*c factors)
_CI = _A / _B
_INV = [
    [_A, _B, 0.5 * _CI],
    [_A, 0.0, -_CI],
    [_A, -_B, 0.5 * _CI],
]


def rgb2opp(im: jnp.ndarray) -> jnp.ndarray:
    """RGB -> opponent color space (identity unless last dim == 3)."""
    if im.shape[-1] != 3:
        return im
    m = jnp.asarray(_FWD, dtype=im.dtype)
    return jnp.einsum("...c,kc->...k", im, m, precision="highest")


def opp2rgb(im: jnp.ndarray) -> jnp.ndarray:
    """Opponent -> RGB color space (identity unless last dim == 3)."""
    if im.shape[-1] != 3:
        return im
    m = jnp.asarray(_INV, dtype=im.dtype)
    return jnp.einsum("...c,kc->...k", im, m, precision="highest")

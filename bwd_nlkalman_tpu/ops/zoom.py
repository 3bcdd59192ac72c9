"""Pyramid zoom operators (TV-L1 flavor).

Reference: lib/tvl1flow/zoom.c — zoom_out presmooths with
sigma = 0.6 sqrt(1/f^2 - 1) and resamples bicubically at (j/f, i/f) with
clamped taps (border_out=false); zoom_in resamples at (j / (nxx/nx), ...).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .gaussian import gaussian_blur
from .warp import bicubic_sample

ZOOM_SIGMA_ZERO = 0.6


def zoom_size(nx: int, ny: int, factor: float) -> tuple[int, int]:
    """Static size computation (zoom.c:24-36)."""
    return int(nx * factor + 0.5), int(ny * factor + 0.5)


def zoom_out(im: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Downsample a (H, W) image by ``factor`` in (0, 1)."""
    h, w = im.shape
    nxx, nyy = zoom_size(w, h, factor)
    sigma = ZOOM_SIGMA_ZERO * math.sqrt(1.0 / (factor * factor) - 1.0)
    ims = gaussian_blur(im, sigma)
    jj, ii = jnp.meshgrid(
        jnp.arange(nxx, dtype=im.dtype), jnp.arange(nyy, dtype=im.dtype), indexing="xy"
    )
    return bicubic_sample(ims, jj / factor, ii / factor, border_out=False)


def zoom_in(im: jnp.ndarray, nxx: int, nyy: int) -> jnp.ndarray:
    """Upsample a (H, W) image to (nyy, nxx) (zoom.c:87-111)."""
    h, w = im.shape
    fx = nxx / w
    fy = nyy / h
    jj, ii = jnp.meshgrid(
        jnp.arange(nxx, dtype=im.dtype), jnp.arange(nyy, dtype=im.dtype), indexing="xy"
    )
    return bicubic_sample(im, jj / fx, ii / fy, border_out=False)

"""Pyramid zoom operators (TV-L1 flavor), MXU matmul formulation.

Reference: lib/tvl1flow/zoom.c — zoom_out presmooths with
sigma = 0.6 sqrt(1/f^2 - 1) and resamples bicubically at (j/f, i/f) with
clamped taps (border_out=false); zoom_in resamples at (j / (nxx/nx), ...).

Both operations are separable with FIXED sample positions, so each axis
is a dense matrix: out = (Ry @ By) @ img @ (Rx @ Bx)^T, where R holds
the Catmull-Rom tap weights with the reference's per-tap Neumann clamp
(bicubic_interpolation.c:138-234) and B the Gaussian presmooth
(gaussian.blur_matrix_np).  One pair of MXU matmuls replaces a gather
(XLA TPU gathers are scalar row fetches ~1 ms fixed) — weight-identical
to the gather path, only the per-sample summation order differs.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax.numpy as jnp

from .gaussian import blur_matrix_np

ZOOM_SIGMA_ZERO = 0.6


def zoom_size(nx: int, ny: int, factor: float) -> tuple[int, int]:
    """Static size computation (zoom.c:24-36)."""
    return int(nx * factor + 0.5), int(ny * factor + 0.5)


@functools.lru_cache(maxsize=None)
def _resample_matrix_np(n_out: int, n_in: int, inv_scale: float) -> np.ndarray:
    """(n_out, n_in) bicubic sampling matrix at positions i*inv_scale.

    Catmull-Rom weights (the reference cubic, src/nlkalman.c:36 /
    bicubic_interpolation.c), taps floor(pos)-1+{0..3} clamped into
    [0, n_in-1] (per-tap Neumann = edge padding), border_out=false.
    """
    m = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        pos = i * inv_scale
        x0 = math.floor(pos)
        fx = pos - x0
        w = (
            0.5 * (-fx + 2 * fx * fx - fx ** 3),
            1.0 - 2.5 * fx * fx + 1.5 * fx ** 3,
            0.5 * (fx + 4 * fx * fx - 3 * fx ** 3),
            0.5 * (-fx * fx + fx ** 3),
        )
        for l in range(4):
            k = min(max(x0 - 1 + l, 0), n_in - 1)
            m[i, k] += w[l]
    return m.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _zoom_out_matrix_np(n_out: int, n_in: int, factor: float) -> np.ndarray:
    """Combined presmooth+resample axis matrix for zoom_out."""
    sigma = ZOOM_SIGMA_ZERO * math.sqrt(1.0 / (factor * factor) - 1.0)
    r = _resample_matrix_np(n_out, n_in, 1.0 / factor).astype(np.float64)
    b = blur_matrix_np(n_in, sigma).astype(np.float64)
    return (r @ b).astype(np.float32)


def _apply_sep(im: jnp.ndarray, ay: np.ndarray, ax: np.ndarray) -> jnp.ndarray:
    ayj = jnp.asarray(ay, im.dtype)
    axj = jnp.asarray(ax, im.dtype)
    out = jnp.einsum(
        "ij,kj->ik", im, axj, precision="highest",
        preferred_element_type=jnp.float32,
    )
    return jnp.einsum(
        "ij,jk->ik", ayj, out, precision="highest",
        preferred_element_type=jnp.float32,
    ).astype(im.dtype)


def zoom_out(im: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Downsample a (H, W) image by ``factor`` in (0, 1)."""
    h, w = im.shape
    nxx, nyy = zoom_size(w, h, factor)
    return _apply_sep(
        im,
        _zoom_out_matrix_np(nyy, h, float(factor)),
        _zoom_out_matrix_np(nxx, w, float(factor)),
    )


def zoom_in(im: jnp.ndarray, nxx: int, nyy: int) -> jnp.ndarray:
    """Upsample a (H, W) image to (nyy, nxx) (zoom.c:87-111)."""
    h, w = im.shape
    return _apply_sep(
        im,
        _resample_matrix_np(nyy, h, h / nyy),
        _resample_matrix_np(nxx, w, w / nxx),
    )

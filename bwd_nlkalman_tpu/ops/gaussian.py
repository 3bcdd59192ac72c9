"""Separable Gaussian blur reproducing the TV-L1 reference convolution.

Reference: gaussian(), lib/tvl1flow/mask.c:217-333.  Details replicated:

- one-sided kernel length ``size = int(5 * sigma) + 1``, taps
  B[i] = exp(-i^2 / (2 sigma^2)) / (sigma sqrt(2 pi)), normalized by
  (2 * sum(B) - B[0]);
- asymmetric reflecting boundary: the LEFT/TOP pad mirrors WITHOUT repeating
  the edge pixel (R[i] = I[size - i], mask.c:268-270) while the RIGHT/BOTTOM
  pad mirrors WITH the edge pixel repeated (R[bdx+i] = I[xdim-i-1],
  mask.c:270) — a quirk of the C indexing we keep for parity.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _kernel_np(sigma: float) -> np.ndarray:
    size = int(5 * sigma) + 1
    i = np.arange(size, dtype=np.float64)
    b = np.exp(-i * i / (2.0 * sigma * sigma)) / (sigma * np.sqrt(2.0 * np.pi))
    norm = 2.0 * b.sum() - b[0]
    b /= norm
    # full symmetric kernel [B[size-1] ... B[1], B[0], B[1] ... B[size-1]]
    return np.concatenate([b[:0:-1], b]).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """In-place-equivalent separable blur of a (H, W) image."""
    size = int(5 * sigma) + 1
    kern = jnp.asarray(_kernel_np(float(sigma)), dtype=img.dtype)

    def _pad_axis1(x):
        w = x.shape[1]
        left = x[:, size:0:-1]            # I[size] ... I[1]   (no edge)
        right = x[:, w - 1 : w - size - 1 : -1]  # I[w-1] ... I[w-size] (edge kept)
        return jnp.concatenate([left, x, right], axis=1)

    def _conv_axis1(x):
        xp = _pad_axis1(x)
        w = x.shape[1]
        # pad is `size` wide but the kernel half-width is size-1 => offset 1
        acc = jnp.zeros_like(x)
        for j in range(2 * size - 1):
            acc = acc + kern[j] * xp[:, j + 1 : j + 1 + w]
        return acc

    # rows then columns, like the reference
    img = _conv_axis1(img)
    img = _conv_axis1(img.T).T
    return img

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


@functools.lru_cache(maxsize=None)
def blur_matrix_np(n: int, sigma: float) -> np.ndarray:
    """The 1-D blur as an (n, n) matrix: out = B @ in.

    Same taps and the same asymmetric reflecting boundary as the stencil
    formulation (mask.c:268-270), folded into a dense matrix so the 2-D
    blur becomes two MXU matmuls (out = By @ img @ Bx^T) — the
    stencil version is ~30 shifted adds with HBM round trips per axis.
    """
    size = int(5 * sigma) + 1
    kern = _kernel_np(sigma).astype(np.float64)
    b = np.zeros((n, n), np.float64)
    for i in range(n):
        for j in range(2 * size - 1):
            m = j + 1 + i          # index into the padded row
            if m < size:
                k = size - m       # left mirror, no edge repeat
            elif m < size + n:
                k = m - size
            else:
                k = n - 1 - (m - size - n)  # right mirror, edge repeated
            b[i, np.clip(k, 0, n - 1)] += kern[j]
    return b.astype(np.float32)


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """In-place-equivalent separable blur of a (H, W) image.

    MXU formulation: By @ img @ Bx^T with the boundary conventions baked
    into the matrices; weight-identical to the reference stencil (the
    summation order differs within one output sample).
    """
    h, w = img.shape
    by = jnp.asarray(blur_matrix_np(h, float(sigma)), img.dtype)
    bx = jnp.asarray(blur_matrix_np(w, float(sigma)), img.dtype)
    # rows then columns, like the reference
    out = jnp.einsum(
        "ij,kj->ik", img, bx, precision="highest",
        preferred_element_type=jnp.float32,
    )
    return jnp.einsum(
        "ij,jk->ik", by, out, precision="highest",
        preferred_element_type=jnp.float32,
    ).astype(img.dtype)

"""DCT transforms as matrix products (MXU-friendly).

The reference computes patch DCTs with per-thread FFTW plans
(dct_threads_*, src/nlkalman.c:161-360) and even enumerates an
(unimplemented) MATPROD method "DCT via separable matrix products"
(src/nlkalman.c:135,190-191).  On TPU the matmul formulation IS the fast
path: an 8x8 2-D DCT is a pair of 8x8 matmuls (or one 64x64 matmul on
flattened patches), which maps straight onto the MXU.

Three transform families:

- orthonormal patch DCT (``dct2_patches``/``idct2_patches``): equals the
  reference's normalization (1/sqrt(8*w*h*f) with sqrt(2) DC scaling,
  src/nlkalman.c:281-299), which for f=1 is exactly the orthonormal 2-D
  DCT-II; verified against scipy.fft.dctn(norm='ortho') in tests.

- whole-image DCT (``dct2_image``/``idct2_image``): the multiscale pyramid
  convention (unnormalized FFTW REDFT10 scaled by 1/(4*w*h) forward,
  unnormalized REDFT01 inverse; lib/multiscale/multiscaler.cpp:20-98).

- all-overlapping-patches DCT (``dct_image_all_patches``): DCT of every
  patch position at once — the dense formulation the reference sketches as
  its DCT_IMAGE variant (src/nlkalman.c:953-1404).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _ortho_basis_np(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis: D[k, i] = s_k sqrt(2/n) cos(pi (2i+1) k / 2n)."""
    k = np.arange(n)[:, None].astype(np.float64)
    i = np.arange(n)[None, :].astype(np.float64)
    d = math.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    d[0] *= 1.0 / math.sqrt(2.0)
    return d.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _unnorm_dct2_basis_np(n: int) -> np.ndarray:
    """Unnormalized FFTW REDFT10 matrix U[k, i] = 2 cos(pi (2i+1) k / 2n)."""
    k = np.arange(n)[:, None].astype(np.float64)
    i = np.arange(n)[None, :].astype(np.float64)
    return (2.0 * np.cos(np.pi * (2 * i + 1) * k / (2 * n))).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _unnorm_dct3_basis_np(n: int) -> np.ndarray:
    """Unnormalized FFTW REDFT01 matrix V with V @ U = 2n I."""
    v = _unnorm_dct2_basis_np(n).T.astype(np.float64).copy()
    v[:, 0] *= 0.5
    return v.astype(np.float32)


def patch_dct_matrix(psz: int) -> jnp.ndarray:
    """Orthonormal 1-D DCT-II basis (psz, psz) as a jnp array."""
    return jnp.asarray(_ortho_basis_np(psz))


@functools.lru_cache(maxsize=None)
def _ortho_basis_kron_np(psz: int) -> np.ndarray:
    d = _ortho_basis_np(psz).astype(np.float64)
    return np.kron(d, d).astype(np.float32)  # (psz^2, psz^2), row = ky*psz+kx


def patch_dct_matrix_2d(psz: int) -> jnp.ndarray:
    """Flattened orthonormal 2-D DCT-II basis (psz^2, psz^2): y = B @ vec(p)."""
    return jnp.asarray(_ortho_basis_kron_np(psz))


def dct2_patches(p: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal 2-D DCT-II of patches shaped (..., psz, psz)."""
    d = jnp.asarray(_ortho_basis_np(p.shape[-1]), dtype=p.dtype)
    return jnp.einsum("ki,...ij,lj->...kl", d, p, d, precision="highest")


def idct2_patches(p: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`dct2_patches` (orthonormal => transpose)."""
    d = jnp.asarray(_ortho_basis_np(p.shape[-1]), dtype=p.dtype)
    return jnp.einsum("ik,...ij,jl->...kl", d, p, d, precision="highest")


def dct2_flat(x: jnp.ndarray, psz: int) -> jnp.ndarray:
    """Orthonormal 2-D DCT-II on flattened patches (..., psz*psz) -> same."""
    b = jnp.asarray(_ortho_basis_kron_np(psz), dtype=x.dtype)
    return jnp.einsum("...i,ki->...k", x, b, precision="highest")


def idct2_flat(x: jnp.ndarray, psz: int) -> jnp.ndarray:
    b = jnp.asarray(_ortho_basis_kron_np(psz), dtype=x.dtype)
    return jnp.einsum("...k,ki->...i", x, b, precision="highest")


# ---------------------------------------------------------------------------
# whole-image DCT (multiscale pyramid convention)
# ---------------------------------------------------------------------------


def dct2_image(img: jnp.ndarray) -> jnp.ndarray:
    """Whole-image 2-D DCT-II with the multiscaler normalization.

    img: (H, W, C).  Output: FFTW REDFT10 x REDFT10 of each channel divided
    by 4*H*W (lib/multiscale/multiscaler.cpp:20-62, non-ISOMETRIC build).
    """
    h, w = img.shape[0], img.shape[1]
    uh = jnp.asarray(_unnorm_dct2_basis_np(h), dtype=img.dtype)
    uw = jnp.asarray(_unnorm_dct2_basis_np(w), dtype=img.dtype)
    out = jnp.einsum(
        "ki,ijc,lj->klc", uh, img, uw, precision="highest",
        preferred_element_type=jnp.float32,
    )
    return (out / (4.0 * h * w)).astype(img.dtype)


def idct2_image(coef: jnp.ndarray) -> jnp.ndarray:
    """Whole-image 2-D DCT-III (unnormalized REDFT01), inverse of dct2_image."""
    h, w = coef.shape[0], coef.shape[1]
    vh = jnp.asarray(_unnorm_dct3_basis_np(h), dtype=coef.dtype)
    vw = jnp.asarray(_unnorm_dct3_basis_np(w), dtype=coef.dtype)
    return jnp.einsum(
        "ik,klc,jl->ijc", vh, coef, vw, precision="highest",
        preferred_element_type=jnp.float32,
    ).astype(coef.dtype)


# ---------------------------------------------------------------------------
# DCT of all overlapping patches (dense DCT_IMAGE formulation)
# ---------------------------------------------------------------------------


def dct_image_all_patches(img: jnp.ndarray, psz: int) -> jnp.ndarray:
    """Orthonormal 2-D DCT of every overlapping psz x psz patch.

    img: (H, W, C) -> (H - psz + 1, W - psz + 1, C * psz * psz) where the
    last axis is laid out channel-major: index = c * psz^2 + ky * psz + kx,
    matching the reference's patch layout N1D0[c][hy][hx]
    (src/nlkalman.c:563).

    Computed separably: 8 shifted row-combinations then 8 shifted
    column-combinations, each a small matmul against the DCT basis — all
    dense tensor ops, no gather.
    """
    h, w, c = img.shape
    hh, ww = h - psz + 1, w - psz + 1
    d = _ortho_basis_np(psz)

    # separable shifted-FMA formulation: exact f32, VPU/HBM-bound, and far
    # cheaper to compile than a HIGHEST-precision conv on this backend.
    outs = []
    for ci in range(c):
        im = img[..., ci]
        # rows: A[k] = sum_i D[k,i] im[i:i+hh, :]
        rows = [None] * psz
        for k in range(psz):
            acc = None
            for i in range(psz):
                t = d[k, i] * im[i : i + hh, :]
                acc = t if acc is None else acc + t
            rows[k] = acc                                   # (hh, w)
        # cols: B[k,l] = sum_j D[l,j] A[k][:, j:j+ww]
        for k in range(psz):
            for l in range(psz):
                acc = None
                for j in range(psz):
                    t = d[l, j] * rows[k][:, j : j + ww]
                    acc = t if acc is None else acc + t
                outs.append(acc)                            # (hh, ww)
    return jnp.stack(outs, axis=-1)                         # (hh, ww, c*psz*psz)


def dct_image_all_patches_matmul(img: jnp.ndarray, psz: int,
                                 freq_major: bool = False) -> jnp.ndarray:
    """The reference's MATPROD intent literally: DCT of all overlapping
    patches as ONE (psz^2 x psz^2) matmul against the shifted-slice stack
    (src/nlkalman.c:135,190-191).

    Default MXU precision (bf16-rounded inputs, f32 accumulation) — used
    for the fused kernel's bfloat16 band path where the result is rounded
    to bf16 anyway; the exact-f32 path keeps the shifted-FMA
    :func:`dct_image_all_patches`.

    freq_major=True returns (C*K, hh, ww) (channel-major then frequency)
    instead of (hh, ww, C*K) — the layout the band prep wants.
    """
    h, w, c = img.shape
    hh, ww = h - psz + 1, w - psz + 1
    bk = jnp.asarray(_ortho_basis_kron_np(psz))              # (K, t)
    s = jnp.stack(
        [img[i : i + hh, j : j + ww] for i in range(psz) for j in range(psz)],
        axis=0,
    )                                                        # (t, hh, ww, c)
    out = jnp.einsum(
        "Kt,trsc->cKrs", bk, s, preferred_element_type=jnp.float32,
    )                                                        # (c, K, hh, ww)
    k = psz * psz
    if freq_major:
        return out.reshape(c * k, hh, ww)
    return out.transpose(2, 3, 0, 1).reshape(hh, ww, c * k)

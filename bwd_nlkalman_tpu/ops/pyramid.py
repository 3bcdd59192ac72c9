"""DCT pyramid (the multiscaler decompose/recompose pair) and the
Lanczos-3 pyramid alternative.

DCT pyramid semantics (lib/multiscale/decompose.cpp:31-56,
recompose.cpp:29-53, non-ISOMETRIC build of multiscaler.cpp:20-98):

- decompose: whole-image DCT once with 1/(4 h w) normalization; level i is
  the unnormalized inverse DCT of the top-left (h_i, w_i) coefficient
  block, h_i = int(h_{i-1} / ratio).
- recompose: DCT level 0 (own-size normalization); for each coarser level
  overwrite the lowest int(h_i * c) x int(w_i * c) coefficients with that
  level's DCT (conservative factor c, pipeline uses 0.7,
  scripts/msnlkalman-seq.sh:12); final unnormalized inverse DCT.

Lanczos-3 pyramid (lib/ms-lanczos3): half-phase Lanczos-3 downsampling
(lanczos3_down.m:12-24, kernel lanczos3_kernel.m:5-6), +-0.25-phase
upsampling (lanczos3_up.m:25-48), Laplacian-style recompose
ret = yH + up(gblur(down(yH) - yL) ... (recompose.m:26).
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from .dct import dct2_image, idct2_image
from .gaussian import gaussian_blur


def pyramid_sizes(h: int, w: int, levels: int, ratio: float = 2.0):
    """Level sizes per decompose.cpp:52-54 (integer truncation each level)."""
    sizes = []
    for _ in range(levels):
        sizes.append((h, w))
        h = int(h / ratio)
        w = int(w / ratio)
    return sizes


def dct_decompose(img: jnp.ndarray, levels: int, ratio: float = 2.0):
    """(H, W, C) -> list of `levels` images, level 0 = full size."""
    coef = dct2_image(img)
    out = []
    for (h_i, w_i) in pyramid_sizes(img.shape[0], img.shape[1], levels, ratio):
        out.append(idct2_image(coef[:h_i, :w_i]))
    return out


def dct_recompose(levels_imgs, factor: float = 0.8) -> jnp.ndarray:
    """Inverse of dct_decompose with conservative factor (recompose -c)."""
    coef = dct2_image(levels_imgs[0])
    for img in levels_imgs[1:]:
        li = dct2_image(img)
        h_c = int(img.shape[0] * factor)
        w_c = int(img.shape[1] * factor)
        coef = coef.at[:h_c, :w_c].set(li[:h_c, :w_c])
    return idct2_image(coef)


def auto_pyramid_levels(h: int, w: int) -> int:
    """Level count from pixel count (scripts/msnlkalman-seq.sh:30-40)."""
    n = h * w
    if n < 500_000:
        return 1
    if n < 2_000_000:
        return 2
    if n < 8_000_000:
        return 3
    return 4


# ---------------------------------------------------------------------------
# Lanczos-3 pyramid (lib/ms-lanczos3, Octave reference)
# ---------------------------------------------------------------------------


def _lanczos3_kernel(x: np.ndarray) -> np.ndarray:
    """lanczos3_kernel.m:5-6: sinc(x) sinc(x/3) on |x| < 3."""
    f = np.sinc(x) * np.sinc(x / 3.0)
    return np.where(np.abs(x) < 3.0, f, 0.0)


def _down_taps():
    # half-phase sampling at x + 0.5 apart 2: taps at offsets +-0.5, +-1.5, +-2.5
    x = np.arange(-2.5, 3.0, 1.0)
    k = _lanczos3_kernel(x / 2.0)  # scaled by downsampling factor 2
    return (k / k.sum()).astype(np.float32)


def _up_taps(phase: float):
    # sample at quarter phases: offsets relative to source grid
    x = np.arange(-2, 4, 1.0) - phase
    k = _lanczos3_kernel(x)
    return (k / k.sum()).astype(np.float32)


def _conv_axis(img: jnp.ndarray, taps: np.ndarray, axis: int, stride: int = 1,
               origin: int = 0) -> jnp.ndarray:
    t = jnp.asarray(taps, img.dtype)
    n = img.shape[axis]
    k = len(taps)
    pad = k  # symmetric edge padding
    idx0 = np.arange(origin, n, stride)
    acc = None
    img_p = jnp.concatenate(
        [jnp.flip(jnp.take(img, jnp.arange(pad), axis=axis), axis=axis),
         img,
         jnp.flip(jnp.take(img, jnp.arange(n - pad, n), axis=axis), axis=axis)],
        axis=axis,
    )
    for j in range(k):
        sl = jnp.take(img_p, jnp.asarray(idx0 + j + pad - k // 2), axis=axis)
        acc = sl * t[j] if acc is None else acc + sl * t[j]
    return acc


def lanczos3_down(img: jnp.ndarray) -> jnp.ndarray:
    """Downscale x2 with the normalized half-phase Lanczos-3 kernel."""
    taps = _down_taps()
    out = _conv_axis(img, taps, axis=0, stride=2, origin=0)
    out = _conv_axis(out, taps, axis=1, stride=2, origin=0)
    return out


def lanczos3_up(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Upscale x2 with +-0.25-phase Lanczos-3 kernels (lanczos3_up.m:25-48)."""
    tm = _up_taps(-0.25)
    tp = _up_taps(+0.25)

    def up_axis(x, axis, out_n):
        a = _conv_axis(x, tm, axis=axis)
        b = _conv_axis(x, tp, axis=axis)
        inter = jnp.stack([a, b], axis=axis + 1)
        shp = list(x.shape)
        shp[axis] = 2 * x.shape[axis]
        inter = inter.reshape(shp)
        return jnp.take(inter, jnp.arange(out_n), axis=axis)

    out = up_axis(img, 0, out_h)
    out = up_axis(out, 1, out_w)
    return out


def lanczos3_decompose(img: jnp.ndarray, levels: int):
    """Successive x2 Lanczos-3 downscales (lanczos3_decompose.m:20-31)."""
    out = [img]
    for _ in range(levels - 1):
        out.append(lanczos3_down(out[-1]))
    return out


def lanczos3_recompose(levels_imgs, sigma_blur: float = 1.0) -> jnp.ndarray:
    """Laplacian-style merge: ret = yH + up(gblur(yL - down(yH)))
    (lib/ms-lanczos3/recompose.m:26), applied coarse-to-fine."""
    out = levels_imgs[-1]
    for i in range(len(levels_imgs) - 2, -1, -1):
        y_h = levels_imgs[i]
        diff = out - lanczos3_down(y_h)
        if sigma_blur > 0:
            if diff.ndim == 3:
                diff = jnp.stack(
                    [gaussian_blur(diff[..., c], sigma_blur) for c in range(diff.shape[-1])],
                    axis=-1,
                )
            else:
                diff = gaussian_blur(diff, sigma_blur)
        out = y_h + lanczos3_up(diff, y_h.shape[0], y_h.shape[1])
    return out


def merge_coarse(fine: jnp.ndarray, coarse: jnp.ndarray,
                 factor: float = 0.8) -> jnp.ndarray:
    """Two-image recompose (lib/multiscale/merge_coarse.cpp:11-49, a
    reference tool left out of its build): overwrite the lowest
    int(h_c*factor) x int(w_c*factor) DCT coefficients of `fine` with
    `coarse`'s, then inverse DCT."""
    cf = dct2_image(fine)
    cc = dct2_image(coarse)
    h_c = int(coarse.shape[0] * factor)
    w_c = int(coarse.shape[1] * factor)
    cf = cf.at[:h_c, :w_c].set(cc[:h_c, :w_c])
    return idct2_image(cf)

"""Bicubic interpolation / warping with explicit validity masks.

The reference has two distinct bicubic interpolators:

1. the denoiser-side warp (warp_bicubic, src/nlkalman.c:29-88): floor-based
   taps, out-of-frame taps become NaN and poison the result; occluded pixels
   are set to NaN directly.  NaN is load-bearing there ("no temporal data").
   On TPU we do NOT propagate NaN — :func:`warp_bicubic_nan` returns an
   explicit validity mask instead (True where the reference would have
   produced a finite value).

2. the flow-side interpolator (bicubic_interpolation_at,
   lib/tvl1flow/bicubic_interpolation.c:138-234): truncation-based taps with
   a sign trick, Neumann-clamped, and an "out" flag that zeroes the result
   when any tap fell outside (border_out=true) — used by the TV-L1 warps.
   Reproduced by :func:`bicubic_sample` / :func:`warp_bicubic_zero`.

All functions are pure jnp and vectorized over the full pixel grid.
"""

from __future__ import annotations

import jax.numpy as jnp


def _cubic(v0, v1, v2, v3, x):
    """Catmull-Rom cubic (reference cubic_interpolation, src/nlkalman.c:36)."""
    return v1 + 0.5 * x * (
        v2 - v0 + x * (2.0 * v0 - 5.0 * v1 + 4.0 * v2 - v3 + x * (3.0 * (v1 - v2) + v3 - v0))
    )


def warp_bicubic_nan(
    im: jnp.ndarray,
    flow: jnp.ndarray,
    occl: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Warp ``im`` along ``flow``; invalid pixels masked, not NaN.

    im:   (H, W, C) frame to sample (previous denoised frame)
    flow: (H, W, 2) displacement field (x-component first, like .flo)
    occl: (H, W) occlusion mask; nonzero = occluded (reference passes the
          0/255 plambda mask, tested ``msk[i] == 0`` at src/nlkalman.c:77)

    Returns (warped, valid) with warped (H, W, C) float, valid (H, W) bool.
    valid is False exactly where the reference would produce NaN: occluded
    pixels, or any of the 4x4 taps outside the frame
    (getsample_nan, src/nlkalman.c:29-34).
    """
    h, w = im.shape[0], im.shape[1]
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=flow.dtype), jnp.arange(w, dtype=flow.dtype), indexing="ij"
    )
    xw = xx + flow[..., 0] - 1.0  # reference shifts by -1 (src/nlkalman.c:56-57)
    yw = yy + flow[..., 1] - 1.0

    ix = jnp.floor(xw)
    iy = jnp.floor(yw)
    fx = xw - ix
    fy = yw - iy
    ix = ix.astype(jnp.int32)
    iy = iy.astype(jnp.int32)

    valid = (ix >= 0) & (ix + 3 <= w - 1) & (iy >= 0) & (iy + 3 <= h - 1)
    if occl is not None:
        valid = valid & (occl == 0)

    ixc = jnp.clip(ix, 0, w - 4)
    iyc = jnp.clip(iy, 0, h - 4)

    # gather the 4x4 neighborhoods: rows[i] interpolated along y first
    cols = []
    for i in range(4):
        vals = [im[iyc + j, ixc + i] for j in range(4)]  # each (H, W, C)
        f = fy[..., None]
        cols.append(_cubic(vals[0], vals[1], vals[2], vals[3], f))
    out = _cubic(cols[0], cols[1], cols[2], cols[3], fx[..., None])

    out = jnp.where(valid[..., None], out, 0.0)
    return out, valid


def bicubic_sample(
    im: jnp.ndarray,
    uu: jnp.ndarray,
    vv: jnp.ndarray,
    border_out: bool,
) -> jnp.ndarray:
    """Sample ``im`` (H, W) at float coords (uu, vv), reference semantics.

    Reproduces bicubic_interpolation_at
    (lib/tvl1flow/bicubic_interpolation.c:138-234): truncation toward zero,
    sign-ordered taps, Neumann clamping; if ``border_out`` the result is 0
    wherever ANY tap required clamping.
    """
    h, w = im.shape
    sx = jnp.where(uu < 0, -1, 1).astype(jnp.int32)
    sy = jnp.where(vv < 0, -1, 1).astype(jnp.int32)
    x0 = uu.astype(jnp.int32)  # C-style truncation toward zero
    y0 = vv.astype(jnp.int32)

    # tap order along x: [x0 - sx, x0, x0 + sx, x0 + 2 sx]; same for y.
    # NOTE the reference computes the y-taps' "my" with sx (my = vv - sx,
    # bicubic_interpolation.c:159) — a quirk we replicate verbatim.
    xts = [x0 - sx, x0, x0 + sx, x0 + 2 * sx]
    yts = [y0 - sx, y0, y0 + sy, y0 + 2 * sy]

    out_flag = jnp.zeros(uu.shape, dtype=bool)
    xcl, ycl = [], []
    for t in xts:
        out_flag = out_flag | (t < 0) | (t >= w)
        xcl.append(jnp.clip(t, 0, w - 1))
    for t in yts:
        out_flag = out_flag | (t < 0) | (t >= h)
        ycl.append(jnp.clip(t, 0, h - 1))

    fx = uu - xcl[1].astype(uu.dtype)
    fy = vv - ycl[1].astype(vv.dtype)

    cols = []
    for i in range(4):
        vals = [im[ycl[j], xcl[i]] for j in range(4)]
        cols.append(_cubic(vals[0], vals[1], vals[2], vals[3], fy))
    res = _cubic(cols[0], cols[1], cols[2], cols[3], fx)

    if border_out:
        res = jnp.where(out_flag, 0.0, res)
    return res


def warp_bicubic_zero(im: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """bicubic_interpolation_warp with border_out=true (TV-L1 warps).

    im, u, v: (H, W).  Samples im at (x + u, y + v); zero where any tap
    leaves the frame (lib/tvl1flow/bicubic_interpolation.c:242-264).
    """
    h, w = im.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=u.dtype), jnp.arange(w, dtype=u.dtype), indexing="ij"
    )
    return bicubic_sample(im, xx + u, yy + v, border_out=True)

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


def _use_pallas_warp(h: int, w: int, c: int) -> bool:
    """Gather-free Pallas warp backend selection (BNLK_WARP_BACKEND):
    "gather" (default XLA gather path), "pallas" (force), "auto"
    (pallas on TPU when the source fits VMEM)."""
    import os

    be = os.environ.get("BNLK_WARP_BACKEND", "auto")
    if be == "gather":
        return False
    if h * w < (1 << 17):
        # small pyramid levels: the XLA gather is already cheap and each
        # extra shape costs a Mosaic compile
        return False
    from .warp_pallas import warp_supported

    if not warp_supported(h, w, c):
        return False
    if be == "pallas":
        return True
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _coord_grids(h, w, flow):
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=flow.dtype), jnp.arange(w, dtype=flow.dtype),
        indexing="ij",
    )
    return xx + flow[..., 0], yy + flow[..., 1]


def _flow_rough(u, v) -> jnp.ndarray:
    """Scalar bool: is this displacement field too rough for the
    shift-select warp?  Its cost scales with the local integer-offset
    ranges, so a garbage flow (e.g. TV-L1 on unmatchable content) can
    cost seconds; smooth flow of ANY magnitude stays cheap (ranges are
    of the OFFSET, not the motion).  Beyond the threshold the hybrid
    dispatch takes the gather path instead."""
    ui = jnp.floor(u)
    vi = jnp.floor(v)
    ry = jnp.max(vi) - jnp.min(vi)
    rx = jnp.max(ui) - jnp.min(ui)
    return (ry + 8.0) * (rx + 8.0) > 4096.0


def _hybrid_warp(im3, cx, cy, u, v, pad_mode):
    """lax.cond between the Pallas shift-select warp and the gather warp
    (identical results — exactness verified on-chip); picks by flow
    roughness at runtime."""
    import jax

    from .warp_pallas import bicubic_warp_pallas

    def pallas_branch(args):
        im3, cx, cy = args
        return bicubic_warp_pallas(im3, cx, cy, pad_mode=pad_mode)

    def gather_branch(args):
        im3, cx, cy = args
        return _gather_warp_coords(im3, cx, cy, pad_mode)

    return jax.lax.cond(
        _flow_rough(u, v), gather_branch, pallas_branch, (im3, cx, cy)
    )


def _gather_warp_coords(im3, cx, cy, pad_mode):
    """Gather-path bicubic at absolute coords; same base/tap semantics
    as bicubic_warp_pallas.  Returns (out, valid)."""
    h, w = im3.shape[:2]
    bx = jnp.floor(cx).astype(jnp.int32) - 1
    by = jnp.floor(cy).astype(jnp.int32) - 1
    fx = (cx - jnp.floor(cx))[..., None]
    fy = (cy - jnp.floor(cy))[..., None]
    valid = (bx >= 0) & (bx + 3 <= w - 1) & (by >= 0) & (by + 3 <= h - 1)
    taps = _gather_taps16(
        im3, by, bx, pad_mode="edge" if pad_mode == "edge" else "constant"
    )
    cols = [
        _cubic(taps[..., 0, i, :], taps[..., 1, i, :], taps[..., 2, i, :],
               taps[..., 3, i, :], fy)
        for i in range(4)
    ]
    out = _cubic(cols[0], cols[1], cols[2], cols[3], fx)
    return out, valid


def _cubic(v0, v1, v2, v3, x):
    """Catmull-Rom cubic (reference cubic_interpolation, src/nlkalman.c:36)."""
    return v1 + 0.5 * x * (
        v2 - v0 + x * (2.0 * v0 - 5.0 * v1 + 4.0 * v2 - v3 + x * (3.0 * (v1 - v2) + v3 - v0))
    )




def build_taps16(im: jnp.ndarray, pad_mode: str = "constant"):
    """Precompute the 16-tap stack for :func:`_gather_taps16`.

    The stack depends only on the image, not on the sampling coordinates —
    the TV-L1 warp stage samples the SAME image (and gradients) along a
    different flow on every warp iteration, so building it once per scale
    amortizes the dominant cost of the warp across all nwarps gathers.
    Returns an opaque tuple consumed by :func:`_gather_taps16`.
    """
    squeeze = im.ndim == 2
    if squeeze:
        im = im[..., None]
    h, w, c = im.shape
    g = 4
    imp = jnp.pad(im, ((g, g + 3), (g, g + 3), (0, 0)), mode=pad_mode)
    taps = jnp.stack(
        [imp[j : j + h + 2 * g, i : i + w + 2 * g] for j in range(4) for i in range(4)],
        axis=2,
    )  # (H+2g, W+2g, 16, C)
    import os

    if os.environ.get("BNLK_WARP_DTYPE", "float32") == "bfloat16":
        # TPU gathers are bandwidth-bound on the tap rows; bf16 halves the
        # randomly-read bytes (PSNR-gated like BNLK_WINDOW_DTYPE)
        taps = taps.astype(jnp.bfloat16)
    flat = taps.reshape((h + 2 * g) * (w + 2 * g), 16 * c)
    return (flat, h, w, c, squeeze)


def _gather_taps16(im: jnp.ndarray, base_y: jnp.ndarray, base_x: jnp.ndarray,
                   pad_mode: str = "constant", taps=None):
    """All 16 bicubic taps in ONE row-gather.

    im: (H, W) or (H, W, C); base_y/base_x: (H, W) int32 top-left tap
    coords (may be out of range — caller masks).  Returns (H, W, 4, 4[, C])
    values sampled from a zero-padded copy; a single gather of
    16(*C)-float rows replaces 16 scalar gathers (an order of magnitude
    faster on TPU).  `taps` (from :func:`build_taps16`) skips rebuilding
    the tap stack.
    """
    if taps is None:
        taps = build_taps16(im, pad_mode)
    flat_taps, h, w, c, squeeze = taps
    g = 4
    by = jnp.clip(base_y, -g, h + g - 1) + g
    bx = jnp.clip(base_x, -g, w + g - 1) + g
    flat = (by * (w + 2 * g) + bx).ravel()
    out = flat_taps[flat].astype(jnp.float32)
    out = out.reshape(base_y.shape + (4, 4, c))
    if squeeze:
        out = out[..., 0]
    return out


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
    if _use_pallas_warp(h, w, im.shape[2] if im.ndim == 3 else 1):
        # kernel convention: base = floor(c)-1 == floor(c-1) = the
        # reference's floor-based footprint with its -1 shift pre-applied
        cx, cy = _coord_grids(h, w, flow)
        im3 = im if im.ndim == 3 else im[..., None]
        out, valid = _hybrid_warp(
            im3, cx, cy, flow[..., 0], flow[..., 1], "zero"
        )
        if occl is not None:
            valid = valid & (occl == 0)
        out = jnp.where(valid[..., None], out, 0.0)
        if im.ndim == 2:
            out = out[..., 0]
        return out, valid
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

    taps = _gather_taps16(im, iy, ix)                # (H, W, 4, 4, C)
    f = fy[..., None]
    cols = [
        _cubic(taps[..., 0, i, :], taps[..., 1, i, :], taps[..., 2, i, :],
               taps[..., 3, i, :], f)
        for i in range(4)
    ]
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
    (lib/tvl1flow/bicubic_interpolation.c:138-234): per-tap Neumann
    clamping (edge padding is equivalent); if ``border_out`` the result is
    0 wherever any tap fell outside the frame.  Uses the single-gather
    fast path: the reference's truncation-based sign-ordered taps select
    the same four sample points and the same interpolating cubic as the
    floor-based footprint used here.
    """
    # NB deliberately NOT routed through the shift-select Pallas warp:
    # resampling grids (zoom) have linearly varying integer offsets whose
    # range ~ the image width — the worst case for shift-select — while
    # the gather path is fast on regular grids.
    h, w = im.shape[:2]
    x0 = jnp.floor(uu)
    y0 = jnp.floor(vv)
    fx = uu - x0
    fy = vv - y0
    bx = x0.astype(jnp.int32) - 1
    by = y0.astype(jnp.int32) - 1
    out_flag = (bx < 0) | (bx + 3 >= w) | (by < 0) | (by + 3 >= h)
    taps = _gather_taps16(im, by, bx, pad_mode="edge")
    cols = [
        _cubic(taps[..., 0, i], taps[..., 1, i], taps[..., 2, i],
               taps[..., 3, i], fy)
        for i in range(4)
    ]
    res = _cubic(cols[0], cols[1], cols[2], cols[3], fx)
    if border_out:
        res = jnp.where(out_flag, 0.0, res)
    return res


def warp_bicubic_zero(im: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """bicubic_interpolation_warp with border_out=true (TV-L1 warps).

    im, u, v: (H, W).  Samples im at (x + u, y + v); zero where any tap
    leaves the frame (lib/tvl1flow/bicubic_interpolation.c:242-264).

    Fast single-gather formulation with floor-based taps.  The reference
    uses truncation-based sign-ordered taps, which select the SAME four
    sample points and the same interpolating cubic for every in-range
    coordinate; its one quirk — the first y-tap taking the x-sign when
    the signs differ (bicubic_interpolation.c:159) — is not reproduced
    (the out-flag makes both versions zero at the affected border band;
    flow parity vs the C binary is asserted in tests).
    """
    h, w = im.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=u.dtype), jnp.arange(w, dtype=u.dtype), indexing="ij"
    )
    uu = xx + u
    vv = yy + v
    x0 = jnp.floor(uu)
    y0 = jnp.floor(vv)
    fx = uu - x0
    fy = vv - y0
    bx = x0.astype(jnp.int32) - 1
    by = y0.astype(jnp.int32) - 1
    # reference "out" flag: any of the sign-ordered taps outside [0, n)
    # == the floor-based 4x4 footprint leaving the frame
    out_flag = (bx < 0) | (bx + 3 >= w) | (by < 0) | (by + 3 >= h)
    taps = _gather_taps16(im, by, bx)                # (H, W, 4, 4)
    cols = [
        _cubic(taps[..., 0, i], taps[..., 1, i], taps[..., 2, i],
               taps[..., 3, i], fy)
        for i in range(4)
    ]
    res = _cubic(cols[0], cols[1], cols[2], cols[3], fx)
    return jnp.where(out_flag, 0.0, res)


def warp_bicubic_zero_multi(ims: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                            taps=None) -> jnp.ndarray:
    """warp_bicubic_zero for C stacked images (H, W, C) sharing one flow —
    a single gather serves all channels (the TV-L1 warp stage warps I1 and
    its two gradients along the same flow, tvl1flow_lib.c:145-147).
    Pass ``taps=build_taps16(ims)`` to amortize the tap stack across
    repeated warps of the same image."""
    h, w = ims.shape[:2]
    if _use_pallas_warp(h, w, ims.shape[2]):
        yy, xx = jnp.meshgrid(
            jnp.arange(h, dtype=u.dtype), jnp.arange(w, dtype=u.dtype),
            indexing="ij",
        )
        out, valid = _hybrid_warp(ims, xx + u, yy + v, u, v, "edge")
        return jnp.where(valid[..., None], out, 0.0)
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=u.dtype), jnp.arange(w, dtype=u.dtype), indexing="ij"
    )
    uu = xx + u
    vv = yy + v
    x0 = jnp.floor(uu)
    y0 = jnp.floor(vv)
    fx = (uu - x0)[..., None]
    fy = (vv - y0)[..., None]
    bx = x0.astype(jnp.int32) - 1
    by = y0.astype(jnp.int32) - 1
    out_flag = (bx < 0) | (bx + 3 >= w) | (by < 0) | (by + 3 >= h)
    taps = _gather_taps16(ims, by, bx, taps=taps)    # (H, W, 4, 4, C)
    cols = [
        _cubic(taps[..., 0, i, :], taps[..., 1, i, :], taps[..., 2, i, :],
               taps[..., 3, i, :], fy)
        for i in range(4)
    ]
    res = _cubic(cols[0], cols[1], cols[2], cols[3], fx)
    return jnp.where(out_flag[..., None], 0.0, res)

"""Multiscale (DCT-pyramid) denoising pipeline — msnlkalman-seq.sh on device.

Per frame (scripts/msnlkalman-seq.sh:53-111):

- decompose the noisy frame AND the previous frame's full-resolution
  filtered outputs into DCT pyramids (:58-62);
- coarse-to-fine per level: TV-L1 flow (tau .25, lambda .2, theta .4,
  fscale 1 — :82), occlusion threshold 0.5 (:87), two-pass NL-Kalman with
  sigma_l = sigma / ratio^l and sigma_l-resolved default parameters;
- recompose the per-level outputs with conservative factor 0.7 (:109-110).

Multiscale smoothing (:119-166) runs backward per level on the per-level
filtered stacks, with the FULL sigma passed to the smoother (-s $SIG,
:158 — reproduced as-is), then recomposes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import nlkalman_filter_frame, nlkalman_smooth_frame
from ..flow import occlusion_mask
from ..flow.tvl1 import tvl1_flow, luma
from ..ops.color import rgb2opp, opp2rgb
from ..ops.pyramid import (
    dct_decompose, dct_recompose, auto_pyramid_levels,
    lanczos3_decompose, lanczos3_recompose,
)
from ..ops.warp import warp_bicubic_nan
from ..params import NLKParams, FilterMode, default_params

_MS_FLOW = dict(tau=0.25, lambda_=0.2, theta=0.4, nscales=100,
                fscale=1, zfactor=0.5, nwarps=5, epsilon=0.01)
_MS_OCC_TH = 0.5


def _ms_flow(i0, i1):
    return tvl1_flow(i0, i1, **_MS_FLOW)


def _filter_level(noisy_l, f10_l, f20_l, sigma_l, p1, p2):
    """One pyramid level: flow + occlusion + warp + two filtering passes."""
    n_opp = rgb2opp(noisy_l)
    if f20_l is None:
        f11 = nlkalman_filter_frame(n_opp, None, None, None, sigma_l, p1)
        f21 = nlkalman_filter_frame(n_opp, None, None, f11, sigma_l, p2)
        return opp2rgb(f11), opp2rgb(f21)
    flow = _ms_flow(luma(noisy_l), luma(f20_l))
    occ = occlusion_mask(flow, _MS_OCC_TH)
    c = noisy_l.shape[-1]
    both = jnp.concatenate([rgb2opp(f10_l), rgb2opp(f20_l)], axis=-1)
    wb, v1 = warp_bicubic_nan(both, flow, occ)
    f11 = nlkalman_filter_frame(n_opp, wb[..., :c], v1, None, sigma_l, p1)
    f21 = nlkalman_filter_frame(n_opp, wb[..., c:], v1, f11, sigma_l, p2)
    return opp2rgb(f11), opp2rgb(f21)


@functools.partial(jax.jit, static_argnames=("sigma", "levels", "rec", "ratio"))
def ms_filter_sequence(
    noisy: jnp.ndarray,
    sigma: float,
    levels: int | None = None,
    rec: float = 0.7,
    ratio: float = 2.0,
):
    """Multiscale forward filtering.

    noisy: (T, H, W, C).  Returns (flt1, flt2, flt2_levels) where
    flt2_levels is a tuple of per-level flt2 stacks (input to multiscale
    smoothing).
    """
    t, h, w, c = noisy.shape
    if levels is None:
        levels = auto_pyramid_levels(h, w)
    sig_l = [sigma / (ratio ** l) for l in range(levels)]
    p1 = [default_params(s, FilterMode.FLT1) for s in sig_l]
    p2 = [default_params(s, FilterMode.FLT2) for s in sig_l]

    def frame_step(flt1_full, flt2_full, frame, first):
        pyr_n = dct_decompose(frame, levels, ratio)
        if first:
            pyr_f1 = pyr_f2 = [None] * levels
        else:
            pyr_f1 = dct_decompose(flt1_full, levels, ratio)
            pyr_f2 = dct_decompose(flt2_full, levels, ratio)
        f11_l, f21_l = [None] * levels, [None] * levels
        for l in range(levels - 1, -1, -1):
            f11_l[l], f21_l[l] = _filter_level(
                pyr_n[l], pyr_f1[l], pyr_f2[l], sig_l[l], p1[l], p2[l]
            )
        flt1 = dct_recompose(f11_l, rec) if levels > 1 else f11_l[0]
        flt2 = dct_recompose(f21_l, rec) if levels > 1 else f21_l[0]
        return flt1, flt2, tuple(f21_l)

    flt1_0, flt2_0, lv0 = frame_step(None, None, noisy[0], True)

    def step(carry, frame):
        flt1_full, flt2_full = carry
        flt1, flt2, lv = frame_step(flt1_full, flt2_full, frame, False)
        return (flt1, flt2), (flt1, flt2, lv)

    (_, _), (f1_rest, f2_rest, lv_rest) = jax.lax.scan(
        step, (flt1_0, flt2_0), noisy[1:]
    )
    flt1 = jnp.concatenate([flt1_0[None], f1_rest], axis=0)
    flt2 = jnp.concatenate([flt2_0[None], f2_rest], axis=0)
    flt2_levels = tuple(
        jnp.concatenate([lv0[l][None], lv_rest[l]], axis=0) for l in range(levels)
    )
    return flt1, flt2, flt2_levels


@functools.partial(jax.jit, static_argnames=("sigma", "rec"))
def ms_smooth_sequence(flt2_levels, sigma: float, rec: float = 0.7):
    """Multiscale backward smoothing of the per-level filtered stacks.

    flt2_levels: tuple of (T, H_l, W_l, C) stacks.  Returns the recomposed
    (T, H, W, C) smoothed sequence.
    """
    levels = len(flt2_levels)
    ps = default_params(sigma, FilterMode.SMO1)  # full sigma, like :158

    def smooth_level(stack):
        last = stack[-1]

        def step(smo_next, flt2_t):
            flow = _ms_flow(luma(flt2_t), luma(smo_next))
            occ = occlusion_mask(flow, _MS_OCC_TH)
            w0, v0 = warp_bicubic_nan(rgb2opp(smo_next), flow, occ)
            smo = opp2rgb(nlkalman_smooth_frame(rgb2opp(flt2_t), w0, v0, sigma, ps))
            return smo, smo

        _, rest = jax.lax.scan(step, last, stack[:-1], reverse=True)
        return jnp.concatenate([rest, last[None]], axis=0)

    smo_levels = [smooth_level(flt2_levels[l]) for l in range(levels)]
    if levels == 1:
        return smo_levels[0]
    t = smo_levels[0].shape[0]
    frames = [
        dct_recompose([smo_levels[l][ti] for l in range(levels)], rec)
        for ti in range(t)
    ]
    return jnp.stack(frames, axis=0)


def ms_denoise_sequence(noisy, sigma, levels=None, rec=0.7, smoothing=True,
                        pyramid: str = "dct"):
    """Full multiscale pipeline (msnlkalman-seq.sh; pyramid="lz3" selects
    the Lanczos-3 variant, msnlkalman-lz3-seq.sh)."""
    if pyramid == "lz3":
        flt1, flt2, flt2_levels = lz3_filter_sequence(noisy, sigma, levels, rec)
        if not smoothing:
            return flt1, flt2, None
        return flt1, flt2, lz3_smooth_sequence(flt2, flt2_levels, sigma, rec)
    flt1, flt2, flt2_levels = ms_filter_sequence(noisy, sigma, levels, rec)
    if not smoothing:
        return flt1, flt2, None
    smo1 = ms_smooth_sequence(flt2_levels, sigma, rec)
    return flt1, flt2, smo1


# ---------------------------------------------------------------------------
# Lanczos-3 pyramid variant (msnlkalman-lz3-seq.sh)
# ---------------------------------------------------------------------------

# lz3 flow/occlusion parameters come from the script's OPM string
# ("1 0.25 0.75 ...", tvl1 argv "$NPROC 0 $DW 0 0 $FSCALE"
# scripts/msnlkalman-lz3-seq.sh:100-102): tau/theta/nscales at their tvl1
# defaults, lambda 0.25, occlusion threshold 0.75 — the single-scale
# pipeline values, unlike the DCT-pyramid script's 0.2/0.4/0.5.
_LZ3_FLOW = dict(tau=0.25, lambda_=0.25, theta=0.3, nscales=100,
                 fscale=1, zfactor=0.5, nwarps=5, epsilon=0.01)
_LZ3_OCC_TH = 0.75


def _lz3_flow(i0, i1):
    return tvl1_flow(i0, i1, **_LZ3_FLOW)


def _lz3_filter_level(noisy_l, f10_l, f20_l, sigma_l, p1, p2):
    n_opp = rgb2opp(noisy_l)
    if f20_l is None:
        f11 = nlkalman_filter_frame(n_opp, None, None, None, sigma_l, p1)
        f21 = nlkalman_filter_frame(n_opp, None, None, f11, sigma_l, p2)
        return opp2rgb(f11), opp2rgb(f21)
    flow = _lz3_flow(luma(noisy_l), luma(f20_l))
    occ = occlusion_mask(flow, _LZ3_OCC_TH)
    c = noisy_l.shape[-1]
    both = jnp.concatenate([rgb2opp(f10_l), rgb2opp(f20_l)], axis=-1)
    wb, v1 = warp_bicubic_nan(both, flow, occ)
    f11 = nlkalman_filter_frame(n_opp, wb[..., :c], v1, None, sigma_l, p1)
    f21 = nlkalman_filter_frame(n_opp, wb[..., c:], v1, f11, sigma_l, p2)
    return opp2rgb(f11), opp2rgb(f21)


@functools.partial(jax.jit, static_argnames=("sigma", "levels", "rec"))
def lz3_filter_sequence(
    noisy: jnp.ndarray,
    sigma: float,
    levels: int | None = None,
    rec: float = 0.7,
):
    """Lanczos-3 multiscale forward filtering
    (scripts/msnlkalman-lz3-seq.sh:59-128).

    Like ms_filter_sequence but with the smooth Lanczos-3 pyramid
    (lanczos3_decompose.m) and Laplacian-merge recompose (recompose.m:26,
    blur sigma = the script's PYR_REC argument, default 0.7).  Previous
    full-resolution outputs are re-decomposed every frame (:75-78).
    Returns (flt1, flt2, flt2_levels).
    """
    t, h, w, c = noisy.shape
    if levels is None:
        levels = auto_pyramid_levels(h, w)
    sig_l = [sigma / (2.0 ** l) for l in range(levels)]
    p1 = [default_params(s, FilterMode.FLT1) for s in sig_l]
    p2 = [default_params(s, FilterMode.FLT2) for s in sig_l]

    def frame_step(flt1_full, flt2_full, frame, first):
        pyr_n = lanczos3_decompose(frame, levels)
        if first:
            pyr_f1 = pyr_f2 = [None] * levels
        else:
            pyr_f1 = lanczos3_decompose(flt1_full, levels)
            pyr_f2 = lanczos3_decompose(flt2_full, levels)
        f11_l, f21_l = [None] * levels, [None] * levels
        for l in range(levels - 1, -1, -1):
            f11_l[l], f21_l[l] = _lz3_filter_level(
                pyr_n[l], pyr_f1[l], pyr_f2[l], sig_l[l], p1[l], p2[l]
            )
        flt1 = lanczos3_recompose(f11_l, rec) if levels > 1 else f11_l[0]
        flt2 = lanczos3_recompose(f21_l, rec) if levels > 1 else f21_l[0]
        return flt1, flt2, tuple(f21_l)

    flt1_0, flt2_0, lv0 = frame_step(None, None, noisy[0], True)

    def step(carry, frame):
        flt1_full, flt2_full = carry
        flt1, flt2, lv = frame_step(flt1_full, flt2_full, frame, False)
        return (flt1, flt2), (flt1, flt2, lv)

    (_, _), (f1_rest, f2_rest, lv_rest) = jax.lax.scan(
        step, (flt1_0, flt2_0), noisy[1:]
    )
    flt1 = jnp.concatenate([flt1_0[None], f1_rest], axis=0)
    flt2 = jnp.concatenate([flt2_0[None], f2_rest], axis=0)
    flt2_levels = tuple(
        jnp.concatenate([lv0[l][None], lv_rest[l]], axis=0)
        for l in range(levels)
    )
    return flt1, flt2, flt2_levels


@functools.partial(jax.jit, static_argnames=("sigma", "rec"))
def lz3_smooth_sequence(flt2, flt2_levels, sigma: float, rec: float = 0.7):
    """Lanczos-3 multiscale backward smoothing
    (scripts/msnlkalman-lz3-seq.sh:135-190).

    Unlike the DCT-pyramid script, the lz3 script re-decomposes the
    RECOMPOSED smoothed frame t+1 every step (:154 "$DECO smo1-(i+1)"),
    so the carry is the full-resolution smoothed frame.  The smoother
    gets the full sigma at every level (:166, -s $SIG).
    """
    levels = len(flt2_levels)
    ps = default_params(sigma, FilterMode.SMO1)
    smo_last = flt2[-1]

    def step(smo_next_full, lv_t):
        pyr_s0 = lanczos3_decompose(smo_next_full, levels)
        smo_l = [None] * levels
        for l in range(levels - 1, -1, -1):
            f1 = lv_t[l]
            flow = _lz3_flow(luma(f1), luma(pyr_s0[l]))
            occ = occlusion_mask(flow, _LZ3_OCC_TH)
            w0, v0 = warp_bicubic_nan(rgb2opp(pyr_s0[l]), flow, occ)
            smo_l[l] = opp2rgb(
                nlkalman_smooth_frame(rgb2opp(f1), w0, v0, sigma, ps)
            )
        smo = lanczos3_recompose(smo_l, rec) if levels > 1 else smo_l[0]
        return smo, smo

    _, rest = jax.lax.scan(
        step, smo_last,
        tuple(lv[:-1] for lv in flt2_levels),
        reverse=True,
    )
    return jnp.concatenate([rest, smo_last[None]], axis=0)

"""Dense TPU formulation of the NL-Kalman filter and RTS smoother kernels.

This re-designs the reference's patch-at-a-time OpenMP loops
(nlkalman_filter_frame, src/nlkalman.c:518-951; nlkalman_smooth_frame,
src/nlkalman.c:1409-1865) as dense tensor ops over all patch sites at once
— the formulation the reference itself sketches with its DCT_IMAGE variant
(src/nlkalman.c:953-1404) and its unimplemented DCT-as-matmul MATPROD
method (src/nlkalman.c:135,190-191).

Algorithm per stride-psz/2 patch site p (reference file:line in brackets):

1. validity: a previous-frame patch is "valid" iff every pixel of the
   warped previous frame is valid there [NaN test, src/nlkalman.c:605-609;
   we carry an explicit mask instead of NaN].
2. block matching: L2 patch distances over a search window of radius
   search_sz_t (5) if the site has a valid previous patch else search_sz_x
   (10), normalized per pixel [src/nlkalman.c:637-702]; the k best
   (npatches_t / npatches_x) are selected [qsort+take, :704-707].
   Distances here are computed between orthonormal-DCT patch vectors,
   which equals the reference's pixel-domain L2 by isometry.
3. group statistics in the DCT domain: mean/variance M1/V1 of the current
   frame's patches over the selected group, M0/V0 and transition variance
   V01 over the subgroup with valid previous patches [Welford pass,
   :746-811; equals the two-pass estimate computed here].
4. per-coefficient Kalman update (temporal path, np0>0) or Wiener update
   (spatial path) [:858-904].
5. inverse DCT and window-weighted scatter-add aggregation of the first
   npatches_tagg group members at their own locations, with weight
   1/max(vp, 1e-6) [WEIGHTED_AGGREGATION, :908-931]; pixels never covered
   keep the noisy value [:940-942].

Deviations from the C code (documented per instructions, PSNR-gated in
tests/test_golden.py):

- no "processed mask": the C code skips sites already covered by an earlier
  group member (src/nlkalman.c:597-600), making its output depend on the
  OpenMP scan order. We process every site — deterministic, strictly more
  aggregation, quality-neutral-or-better.
- top-k tie-breaking: lax.top_k breaks exact distance ties by candidate
  index; C qsort's order on ties is implementation-defined.
- numerics: variances via a two-pass estimate centered on the target patch
  instead of sequential Welford; bitwise differences only.
- patch-distance noise correction: the shipped K_SIMILAR_PATCHES build
  sets dista_sigma2 = 0 (src/nlkalman.c:629-630) so our raw-distance
  ranking matches it exactly.  The NON-K build subtracts 2*sigma^2 per
  pixel (b1 absent) and clamps at 0 (:633,702), which collapses all
  near patches into a tie at 0 resolved by qsort order; we reproduce
  that correction only in the dista_th threshold mode (params.dista_th,
  engine.py), where the clamp has no tie-breaking role.

Everything is static-shaped: per-site group membership is expressed as
masks over a fixed k_max slots, variable search radii as masks over the
maximal window.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dct import dct_image_all_patches, patch_dct_matrix
from ..ops.windows import window_function
from ..params import NLKParams


def patch_validity(valid_pix: jnp.ndarray, psz: int) -> jnp.ndarray:
    """Per-patch-position validity: all psz x psz pixels valid.

    valid_pix: (H, W) bool -> (H-psz+1, W-psz+1) bool.  Mirrors the C NaN
    scan of the patch (src/nlkalman.c:605-609) with an explicit mask.
    """
    v = valid_pix.astype(jnp.float32)
    # separable min-pool via two 1-D reductions
    h, w = v.shape
    hh, ww = h - psz + 1, w - psz + 1
    rows = jnp.stack([v[i : i + hh] for i in range(psz)], 0).min(0)  # (hh, w)
    cols = jnp.stack([rows[:, j : j + ww] for j in range(psz)], 0).min(0)
    return cols > 0.5


class _Frame(NamedTuple):
    """Static description of the dense patch topology."""

    h: int
    w: int
    ch: int
    psz: int
    hh: int  # number of patch positions vertically (h - psz + 1)
    ww: int
    sy: np.ndarray  # site coords (stride psz/2), in patch-position space
    sx: np.ndarray


def _topology(h: int, w: int, ch: int, psz: int) -> _Frame:
    step = psz // 2
    hh, ww = h - psz + 1, w - psz + 1
    # C loop: for (py = 0; py < h - psz + 1; py += step)  [src/nlkalman.c:586]
    sy = np.arange(0, hh, step)
    sx = np.arange(0, ww, step)
    return _Frame(h, w, ch, psz, hh, ww, sy, sx)


def _idct_patches_flat(x: jnp.ndarray, psz: int, ch: int) -> jnp.ndarray:
    """Inverse orthonormal 2-D DCT of flattened patches.

    x: (..., ch*psz*psz) with layout c*psz^2 + ky*psz + kx ->
    (..., psz, psz, ch) pixel patches.
    """
    d = patch_dct_matrix(psz).astype(x.dtype)
    xr = x.reshape(*x.shape[:-1], ch, psz, psz)
    # x[i,j] = sum_kl D[k,i] F[k,l] D[l,j]  (orthonormal inverse = transpose)
    out = jnp.einsum("ki,...ckl,lj->...ijc", d, xr, d, precision="highest")
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "sigma", "prms", "mode", "has_prev", "has_basic", "chunk_sites",
        "site_rows", "return_accum",
    ),
)
def _dense_pass(
    cur: jnp.ndarray,           # (H, W, C) noisy frame (filter) / filtered (smoother)
    prev: jnp.ndarray,          # (H, W, C) warped previous denoised / next smoothed
    prev_valid: jnp.ndarray,    # (H, W) bool validity of `prev`
    basic: jnp.ndarray,         # (H, W, C) basic estimate (filter-2's flt1) or cur
    sigma: float,
    prms: NLKParams,
    mode: str,                  # "filter" | "smooth"
    has_prev: bool,
    has_basic: bool,
    chunk_sites: int,
    site_rows: tuple | None = None,   # static (start, stop) site rows (local)
    qy_bounds: jnp.ndarray | None = None,  # (2,) valid local candidate-row range
    return_accum: bool = False,       # return (out_acc, agg) pre-normalization
) -> jnp.ndarray:
    h, w, ch = cur.shape
    psz = prms.patch_sz
    top = _topology(h, w, ch, psz)
    f = ch * psz * psz
    sigma2 = sigma * sigma

    # search radius: the filter searches +-search_sz_x without temporal data,
    # +-search_sz_t with it [src/nlkalman.c:640]; the smoother always uses
    # search_sz_t [src/nlkalman.c:1527].
    if mode == "filter":
        rad = max(prms.search_sz_x, prms.search_sz_t)
        rad_t = prms.search_sz_t
    else:
        rad = prms.search_sz_t
        rad_t = prms.search_sz_t

    np_t, np_x, nagg = prms.npatches_t, prms.npatches_x, prms.npatches_tagg
    n_off = (2 * rad + 1) ** 2
    k_max = min(max(np_t, np_x, nagg, 1), n_off)

    # ---- dense patch transforms -------------------------------------------
    x_img = basic if has_basic else cur
    xd = dct_image_all_patches(x_img, psz)                     # (hh, ww, F)
    nd = dct_image_all_patches(cur, psz) if has_basic else xd  # PG source
    if has_prev:
        dd = dct_image_all_patches(prev, psz)
        pval = patch_validity(prev_valid, psz)
    else:
        dd = jnp.zeros_like(xd)
        pval = jnp.zeros((top.hh, top.ww), dtype=bool)

    pad = [(rad, rad), (rad, rad), (0, 0)]
    xd_p = jnp.pad(xd, pad)
    nd_p = jnp.pad(nd, pad) if has_basic else xd_p
    dd_p = jnp.pad(dd, pad) if has_prev else xd_p  # unused w/o prev (masked)
    pval_p = jnp.pad(pval, pad[:2])

    # window offsets
    oy, ox = np.meshgrid(
        np.arange(-rad, rad + 1), np.arange(-rad, rad + 1), indexing="ij"
    )
    oy = jnp.asarray(oy.reshape(-1), jnp.int32)
    ox = jnp.asarray(ox.reshape(-1), jnp.int32)
    # radius mask for the temporal (smaller) window
    in_rad_t = (jnp.abs(oy) <= rad_t) & (jnp.abs(ox) <= rad_t)

    if qy_bounds is None:
        qy_lo, qy_hi = 0, top.hh
    else:
        qy_lo, qy_hi = qy_bounds[0], qy_bounds[1]

    # site list, padded to a chunk multiple
    step = psz // 2
    sy = top.sy if site_rows is None else np.arange(
        site_rows[0], min(site_rows[1], top.hh), step
    )
    syy, sxx = np.meshgrid(sy, top.sx, indexing="ij")
    sites = np.stack([syy.reshape(-1), sxx.reshape(-1)], axis=-1)
    n_sites = sites.shape[0]
    n_chunks = -(-n_sites // chunk_sites)
    n_padded = n_chunks * chunk_sites
    site_ok_np = np.zeros(n_padded, dtype=bool)
    site_ok_np[:n_sites] = True
    sites = np.concatenate(
        [sites, np.zeros((n_padded - n_sites, 2), dtype=sites.dtype)], axis=0
    )
    sites_j = jnp.asarray(sites, jnp.int32).reshape(n_chunks, chunk_sites, 2)
    site_ok_j = jnp.asarray(site_ok_np).reshape(n_chunks, chunk_sites)

    # aggregation window (gaussian, src/nlkalman.c:542)
    wwin = window_function("gaussian", psz)                     # (psz, psz)

    # patch-pixel offsets for the scatter
    dyy, dxx = np.meshgrid(np.arange(psz), np.arange(psz), indexing="ij")
    dyy = jnp.asarray(dyy, jnp.int32)
    dxx = jnp.asarray(dxx, jnp.int32)

    def process_chunk(carry, inp):
        out_img, agg = carry
        site, s_ok = inp
        py, px = site[:, 0], site[:, 1]                         # (S,)
        # under spatial sharding, sites beyond the global patch range are
        # invalid (their candidates are all masked; this also disables the
        # smoother's passthrough for them)
        s_ok = s_ok & (py >= qy_lo) & (py < qy_hi)
        s = py.shape[0]

        # --- candidate window ------------------------------------------------
        qy = py[:, None] + oy[None, :]                          # (S, O)
        qx = px[:, None] + ox[None, :]
        in_rng = (qy >= qy_lo) & (qy < qy_hi) & (qx >= 0) & (qx < top.ww)

        xp = xd[py, px]                                         # (S, F)
        wx = xd_p[qy + rad, qx + rad]                           # (S, O, F)
        diff = wx - xp[:, None, :]
        dist = jnp.maximum(jnp.sum(diff * diff, axis=-1) / f, 0.0)

        prev_p = pval[py, px] if has_prev else jnp.zeros((s,), bool)

        if mode == "filter":
            cand_ok = in_rng & jnp.where(prev_p[:, None], in_rad_t[None, :], True)
        else:
            cand_ok = in_rng
        dist = jnp.where(cand_ok, dist, jnp.inf)

        # --- top-k selection -------------------------------------------------
        negv, idx = jax.lax.top_k(-dist, k_max)                 # (S, k)
        slot_ok = jnp.isfinite(negv)
        rank = jnp.arange(k_max)[None, :]
        k_p = jnp.where(prev_p, np_t, np_x)[:, None]
        sel1 = slot_ok & (rank < k_p)

        qsy = py[:, None] + oy[idx]                             # (S, k)
        qsx = px[:, None] + ox[idx]
        xsel = xd_p[qsy + rad, qsx + rad]                       # (S, k, F)
        nsel = nd_p[qsy + rad, qsx + rad] if has_basic else xsel
        if has_prev:
            dsel = dd_p[qsy + rad, qsx + rad]
            pvsel = pval_p[qsy + rad, qsx + rad]
            selprev = sel1 & pvsel & prev_p[:, None]
        else:
            dsel = jnp.zeros_like(xsel)
            selprev = jnp.zeros_like(sel1)

        np1 = jnp.sum(sel1, axis=1).astype(jnp.float32)         # (S,)
        np0 = jnp.sum(selprev, axis=1).astype(jnp.float32)
        np1s = jnp.maximum(np1, 1.0)[:, None]
        np0s = jnp.maximum(np0, 1.0)[:, None]

        # --- group statistics (two-pass, centered on target patch) ----------
        m1 = sel1[..., None]
        xc = xsel - xp[:, None, :]
        m1c = jnp.sum(jnp.where(m1, xc, 0.0), axis=1) / np1s
        v1 = jnp.sum(jnp.where(m1, (xc - m1c[:, None, :]) ** 2, 0.0), axis=1) / np1s
        m1_mean = m1c + xp                                      # (S, F)

        mp = selprev[..., None]
        dc = dsel - xp[:, None, :]
        m0vc = jnp.sum(jnp.where(mp, dc, 0.0), axis=1) / np0s
        v0 = jnp.sum(jnp.where(mp, (dc - m0vc[:, None, :]) ** 2, 0.0), axis=1) / np0s
        v01 = jnp.sum(jnp.where(mp, (dsel - xsel) ** 2, 0.0), axis=1) / np0s

        # aggregation subgroup: first npatches_tagg members in distance order
        # (prev-valid members if np0>0, else any selected) [src/nlkalman.c:781-792]
        prevrank = jnp.cumsum(selprev, axis=1)
        m0sel = selprev & (prevrank <= nagg)
        m0n = jnp.minimum(np0s, float(nagg))
        m0 = jnp.sum(jnp.where(m0sel[..., None], dsel, 0.0), axis=1) / m0n

        temporal = (np0 > 0.0)[:, None]                         # (S, 1)
        # (b1 ? 0 : sigma2) noise subtraction [src/nlkalman.c:869,890]
        sub = 0.0 if has_basic else sigma2

        if mode == "filter":
            # temporal Kalman path [src/nlkalman.c:858-881]
            v_t = v0 + jnp.maximum(0.0, v01 - sub)
            a_t = v_t / (v_t + prms.beta_t * sigma2)
            vp_t = jnp.sum((1.0 - a_t * a_t) * v_t + a_t * a_t * sigma2, axis=-1)
            # spatial Wiener path [src/nlkalman.c:883-904]
            v_x = jnp.maximum(0.0, v1 - sub)
            a_x = v_x / (v_x + prms.beta_x * sigma2)
            vp_x = jnp.sum(a_x * v_x, axis=-1)

            a = jnp.where(temporal, a_t, a_x)                   # (S, F)
            m_ref = jnp.where(temporal, m0, m1_mean)
            member = jnp.where(temporal, m0sel, sel1 & (rank < nagg))
            nagg_eff = jnp.minimum(jnp.where(np0 > 0, np0, np1), float(nagg))
            vp = jnp.where(temporal[:, 0], vp_t, vp_x) * nagg_eff
            filt = a[:, None, :] * nsel + (1.0 - a[:, None, :]) * m_ref[:, None, :]
            wgt = 1.0 / jnp.maximum(vp, 1e-6)
        else:
            # RTS smoothing gain a = V1/(V1 + b V01) [src/nlkalman.c:1768-1775]
            # (denominator guarded: sites with no selected patches have
            # V1 = V01 = 0 and are fully masked out below)
            b = prms.beta_t
            denom = v1 + b * v01
            a = jnp.where(denom > 0.0, v1 / jnp.maximum(denom, 1e-30), 0.0)
            vp = jnp.sum(
                (1.0 - a * a) * v1 + a * a * jnp.maximum(v0 - b * v01, 0.0),
                axis=-1,
            )
            nagg_eff = jnp.minimum(np0, float(nagg))
            vp = vp * nagg_eff
            member = m0sel
            filt = (1.0 - a[:, None, :]) * nsel + a[:, None, :] * dsel
            wgt = 1.0 / jnp.maximum(vp, 1e-6)

        member = member & s_ok[:, None]

        # --- inverse DCT and scatter-add aggregation -------------------------
        patches = _idct_patches_flat(filt, psz, ch)             # (S, k, psz, psz, ch)
        mw = member.astype(cur.dtype) * wgt[:, None]            # (S, k)
        contrib_w = mw[:, :, None, None] * wwin[None, None]     # (S, k, psz, psz)
        contrib = contrib_w[..., None] * patches

        yy = qsy[:, :, None, None] + dyy[None, None]            # (S, k, psz, psz)
        xxp = qsx[:, :, None, None] + dxx[None, None]
        out_img = out_img.at[yy, xxp].add(contrib, mode="drop")
        agg = agg.at[yy, xxp].add(contrib_w, mode="drop")

        if mode == "smooth":
            # passthrough of the filtered patch where np0 == 0
            # [src/nlkalman.c:1795-1804]; vp = 0 => weight 1e6
            pass_m = (np0 == 0.0) & s_ok
            pw = pass_m.astype(cur.dtype) * 1e6
            # gather the raw current patch at p
            pyy = py[:, None, None] + dyy[None]                 # (S, psz, psz)
            pxx = px[:, None, None] + dxx[None]
            cp = cur[pyy, pxx]                                  # (S, psz, psz, ch)
            pw_full = pw[:, None, None] * wwin[None]
            out_img = out_img.at[pyy, pxx].add(pw_full[..., None] * cp, mode="drop")
            agg = agg.at[pyy, pxx].add(pw_full, mode="drop")

        return (out_img, agg), None

    # derive from `cur` so the carry inherits shard_map varying axes
    out0 = jnp.zeros_like(cur)
    agg0 = jnp.zeros_like(cur[..., 0])
    (out_img, agg), _ = jax.lax.scan(
        process_chunk, (out0, agg0), (sites_j, site_ok_j)
    )
    if return_accum:
        return out_img, agg

    # normalize; uncovered pixels copy the input [src/nlkalman.c:940-942]
    covered = agg > 1e-6
    out = jnp.where(covered[..., None], out_img / jnp.maximum(agg, 1e-6)[..., None], cur)
    return out


def _auto_chunk(h: int, w: int, ch: int, psz: int, rad: int) -> int:
    """Pick a site-chunk size bounding the window gather to ~64 MB."""
    f = ch * psz * psz
    n_off = (2 * rad + 1) ** 2
    budget = 64 * 1024 * 1024
    per_site = n_off * f * 4
    step = psz // 2
    n_sites = ((h - psz) // step + 1) * ((w - psz) // step + 1)
    c = max(128, min(n_sites, budget // per_site))
    return int(c)


def _pick_engine(engine: str, h: int, w: int, ch: int,
                 prms: NLKParams, mode: str) -> str:
    """Resolve the engine: explicit arg > BNLK_ENGINE env > auto.

    auto = the fused Pallas kernel (engine_pallas) on TPU whenever its
    VMEM plan fits, else the dense XLA v2 engine.
    """
    import os

    if engine != "auto" and engine.startswith(("v1", "v2", "pallas")):
        return engine
    env = os.environ.get("BNLK_ENGINE", "auto")
    if env != "auto" and env.startswith(("v1", "v2", "pallas")):
        return env
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - no backend at all
        backend = "cpu"
    if backend == "tpu":
        from .engine_pallas import pallas_pass_supported, strips_supported

        wdt = os.environ.get("BNLK_WINDOW_DTYPE", "float32")
        if pallas_pass_supported(h, w, ch, prms, mode, window_dtype=wdt):
            return "pallas"
        # full width exceeds the VMEM budget (e.g. 1080p RGB): column
        # strips with halo overlap-add
        for n in (2, 3, 4):
            if strips_supported(h, w, ch, prms, mode, n, window_dtype=wdt):
                return f"pallas-strips{n}"
    return "v2"


def nlkalman_filter_frame(
    nisy: jnp.ndarray,
    deno0: jnp.ndarray | None,
    prev_valid: jnp.ndarray | None,
    bsic1: jnp.ndarray | None,
    sigma: float,
    prms: NLKParams,
    chunk_sites: int | None = None,
    engine: str = "auto",
    dyn: dict | None = None,
) -> jnp.ndarray:
    """One NL-Kalman filtering pass over a frame (OPP color space).

    nisy:  (H, W, C) noisy frame at t
    deno0: warped previous denoised frame, or None (first frame / no flow)
    prev_valid: (H, W) bool validity of deno0 (None => all valid)
    bsic1: basic estimate at t (pass-1 output) for the second pass, or None
    Mirrors nlkalman_filter_frame (src/nlkalman.c:518-951); see module
    docstring for the documented deviations.
    """
    has_prev = deno0 is not None
    has_basic = bsic1 is not None
    h, w, ch = nisy.shape
    if prev_valid is None:
        prev_valid = jnp.ones((h, w), bool) if has_prev else jnp.zeros((h, w), bool)
    if deno0 is None:
        deno0 = jnp.zeros_like(nisy)
    else:
        deno0 = jnp.where(prev_valid[..., None], deno0, 0.0)
    basic = bsic1 if has_basic else nisy
    engine = _pick_engine(engine, h, w, ch, prms, "filter")
    if engine == "pallas":
        import os
        from .engine_pallas import (
            dense_pass_pallas, dense_pass_pallas_edgesplit)

        wdt = os.environ.get("BNLK_WINDOW_DTYPE", "float32")
        # edge-hybrid ownership split (see dense_pass_pallas_edgesplit).
        # OPT-IN (BNLK_EDGESPLIT=1): measured SLOWER at 1080p gray
        # (49.2 ms vs 41.2 ms) — the narrow edge strips pay the same
        # 128-lane vreg-width floor as the in-band spatial fallback plus
        # a duplicated grid skeleton, so the split only pays on shapes
        # where the middle pass dwarfs the strips (e.g. very wide
        # frames).  Kept parity-tested for such dispatch experiments.
        if (has_prev and prms.search_sz_x > prms.search_sz_t
                and os.environ.get("BNLK_EDGESPLIT", "0") == "1"):
            return dense_pass_pallas_edgesplit(
                nisy, deno0, prev_valid, basic, float(sigma), prms,
                "filter", has_prev, has_basic, window_dtype=wdt, dyn=dyn)
        return dense_pass_pallas(
            nisy, deno0, prev_valid, basic, float(sigma), prms, "filter",
            has_prev, has_basic, window_dtype=wdt, dyn=dyn,
        )
    if engine.startswith("pallas-strips"):
        import os
        from .engine_pallas import dense_pass_pallas_xstrips

        return dense_pass_pallas_xstrips(
            nisy, deno0, prev_valid, basic, float(sigma), prms, "filter",
            has_prev, has_basic, n_strips=int(engine[-1]),
            window_dtype=os.environ.get("BNLK_WINDOW_DTYPE", "float32"),
            dyn=dyn,
        )
    if engine == "v2":
        import os
        from .engine import dense_pass_v2, auto_rows_per_block

        rb = auto_rows_per_block(w, ch, prms.patch_sz, prms.search_sz_x)
        return dense_pass_v2(
            nisy, deno0, prev_valid, basic, float(sigma), prms, "filter",
            has_prev, has_basic, rb,
            window_dtype=os.environ.get("BNLK_WINDOW_DTYPE", "float32"),
            dyn=dyn,
        )
    if chunk_sites is None:
        chunk_sites = _auto_chunk(h, w, ch, prms.patch_sz, prms.search_sz_x)
    return _dense_pass(
        nisy, deno0, prev_valid, basic, float(sigma), prms, "filter",
        has_prev, has_basic, chunk_sites,
    )


def nlkalman_smooth_frame(
    filt1: jnp.ndarray,
    smoo0: jnp.ndarray | None,
    prev_valid: jnp.ndarray | None,
    sigma: float,
    prms: NLKParams,
    bsic1: jnp.ndarray | None = None,
    chunk_sites: int | None = None,
    engine: str = "auto",
    dyn: dict | None = None,
) -> jnp.ndarray:
    """One RTS smoothing pass (OPP space).

    filt1: (H, W, C) filtered frame at t
    smoo0: warped smoothed frame at t+1 (backward pass), or None
    Mirrors nlkalman_smooth_frame (src/nlkalman.c:1409-1865).
    """
    has_prev = smoo0 is not None
    has_basic = bsic1 is not None
    h, w, ch = filt1.shape
    if prev_valid is None:
        prev_valid = jnp.ones((h, w), bool) if has_prev else jnp.zeros((h, w), bool)
    if smoo0 is None:
        smoo0 = jnp.zeros_like(filt1)
    else:
        smoo0 = jnp.where(prev_valid[..., None], smoo0, 0.0)
    basic = bsic1 if has_basic else filt1
    engine = _pick_engine(engine, h, w, ch, prms, "smooth")
    if engine == "pallas":
        import os
        from .engine_pallas import dense_pass_pallas

        return dense_pass_pallas(
            filt1, smoo0, prev_valid, basic, float(sigma), prms, "smooth",
            has_prev, has_basic,
            window_dtype=os.environ.get("BNLK_WINDOW_DTYPE", "float32"),
            dyn=dyn,
        )
    if engine.startswith("pallas-strips"):
        import os
        from .engine_pallas import dense_pass_pallas_xstrips

        return dense_pass_pallas_xstrips(
            filt1, smoo0, prev_valid, basic, float(sigma), prms, "smooth",
            has_prev, has_basic, n_strips=int(engine[-1]),
            window_dtype=os.environ.get("BNLK_WINDOW_DTYPE", "float32"),
            dyn=dyn,
        )
    if engine == "v2":
        import os
        from .engine import dense_pass_v2, auto_rows_per_block

        rb = auto_rows_per_block(w, ch, prms.patch_sz, prms.search_sz_t)
        return dense_pass_v2(
            filt1, smoo0, prev_valid, basic, float(sigma), prms, "smooth",
            has_prev, has_basic, rb,
            window_dtype=os.environ.get("BNLK_WINDOW_DTYPE", "float32"),
            dyn=dyn,
        )
    if chunk_sites is None:
        chunk_sites = _auto_chunk(h, w, ch, prms.patch_sz, prms.search_sz_t)
    return _dense_pass(
        filt1, smoo0, prev_valid, basic, float(sigma), prms, "smooth",
        has_prev, has_basic, chunk_sites,
    )

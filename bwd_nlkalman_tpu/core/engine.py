"""Gather/scatter-free dense NL-Kalman engine (v2).

Same semantics as core.nlkalman._dense_pass (the v1 engine, kept for the
sharded path and as a cross-check oracle), redesigned for the TPU memory
system: no gathers, no scatters, no top_k —

- candidate windows are built from strided static slices of a row band
  (pure dense ops; the site grid has stride psz/2, offsets stride 1);
- k-th-smallest selection thresholds are found by exact bisection on the
  float BITS of the distances (31 fixed dense compare/count passes —
  distances are non-negative so their IEEE bits are order-preserving);
- group statistics are masked einsum reductions over the window axis;
- aggregation exploits that the Kalman/Wiener update is LINEAR in the
  DCT coefficients of the aggregated patch:
      sum_s w_s W (.) idct(a_s (.) Nd[q] + b_s)
        = W (.) idct( (sum_s w_s a_s) (.) Nd[q] + sum_s w_s b_s ),
  so instead of scattering 8x8 pixel patches we accumulate per-patch-
  position DCT-domain gain/bias fields with phase-decomposed dense adds
  (stride-psz/2 site grid x stride-1 offsets -> (psz/2)^2 phase planes),
  then do ONE inverse DCT + window overlap-add fold over the whole frame.

The reference's own DCT_IMAGE variant (src/nlkalman.c:953-1404) is the
conceptual ancestor of this formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dct import dct_image_all_patches, _ortho_basis_kron_np
from ..ops.windows import window_function, _window_1d
from ..params import NLKParams
from .nlkalman import patch_validity

_INF_BITS = np.float32(np.inf).view(np.int32)


def _kth_smallest_bits(bits: jnp.ndarray, k: jnp.ndarray, axis: int = 0):
    """Exact k-th smallest of int32-viewed non-negative floats along `axis`.

    bits: (O, S) int32 (masked-out entries = _INF_BITS); k: (S,) int32.
    Returns (S,) int32 bits such that count(bits <= t) >= k is minimal;
    -1 where k == 0 (selects nothing).
    """
    # derive the carry from `bits` so it inherits shard_map varying axes
    zero = jnp.min(bits, axis=axis) * 0
    lo = zero
    hi = zero + _INF_BITS

    def body(_, lh):
        lo, hi = lh
        mid = lo + (hi - lo) // 2  # avoids int32 overflow of lo + hi
        cnt = jnp.sum(bits <= mid[None, :], axis=axis)
        ok = cnt >= k
        return jnp.where(ok, lo, mid + 1), jnp.where(ok, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 31, body, (lo, hi))
    return jnp.where(k <= 0, -1, hi)


def _phase_cols(arr: jnp.ndarray, step: int) -> jnp.ndarray:
    """(rows, cols, ...) -> (rows, step, cols/step, ...): column phase split
    so window slices become contiguous along the site axis."""
    r, c = arr.shape[0], arr.shape[1]
    rest = arr.shape[2:]
    out = arr.reshape((r, c // step, step) + rest)
    return jnp.moveaxis(out, 2, 1)


def _build_window(band_ph: jnp.ndarray, rb: int, nx: int, rad: int, step: int,
                  pad_l: int):
    """Phased band (BH, step, WQ, ...) -> (O, rb, nx, ...) window tensor.

    All slices are contiguous along the site axis: the site grid has
    stride `step`, so after the column phase split the candidates at a
    fixed offset are a unit-stride run.  Offset order oy-major.
    """
    n_off = 2 * rad + 1
    rows = jnp.stack(
        [band_ph[oy : oy + step * rb : step] for oy in range(n_off)], axis=0
    )  # (n_off, rb, step, WQ, ...)
    out = []
    for ox in range(n_off):
        c0 = ox + pad_l - rad          # padded column of site 0 at this offset
        out.append(rows[:, :, c0 % step, c0 // step : c0 // step + nx])
    cols = jnp.stack(out, axis=1)       # (n_off, n_off, rb, nx, ...)
    return cols.reshape((n_off * n_off,) + cols.shape[2:])


@functools.partial(
    jax.jit,
    static_argnames=(
        "sigma", "prms", "mode", "has_prev", "has_basic", "rows_per_block",
        "site_rows", "return_accum", "window_dtype",
    ),
)
def dense_pass_v2(
    cur: jnp.ndarray,
    prev: jnp.ndarray,
    prev_valid: jnp.ndarray,
    basic: jnp.ndarray,
    sigma: float,
    prms: NLKParams,
    mode: str,
    has_prev: bool,
    has_basic: bool,
    rows_per_block: int = 4,
    site_rows: tuple | None = None,   # static (start, stop) local site rows
    qy_bounds: jnp.ndarray | None = None,  # (2,) valid local patch-row range
    return_accum: bool = False,       # return (out_acc, agg) pre-normalization
    window_dtype: str = "float32",    # "bfloat16" halves window traffic
    dyn: dict | None = None,          # TRACED scalar overrides (training)
) -> jnp.ndarray:
    h, w, ch = cur.shape
    psz = prms.patch_sz
    step = psz // 2
    f = ch * psz * psz
    sigma2 = sigma * sigma
    hh, ww = h - psz + 1, w - psz + 1

    if mode == "filter":
        rad = max(prms.search_sz_x, prms.search_sz_t)
        rad_t = prms.search_sz_t
    else:
        rad = prms.search_sz_t
        rad_t = prms.search_sz_t
    n_off1 = 2 * rad + 1
    n_off = n_off1 * n_off1
    # group sizes / noise multipliers: static from prms, or TRACED scalars
    # (dict np_t/np_x/nagg/beta_x/beta_t) so a parameter search over them
    # reuses ONE compiled kernel across every trial (nlkalman-train.sh's
    # economy; shapes/radii stay static)
    if dyn is not None:
        np_t = dyn["np_t"]
        np_x = dyn["np_x"]
        nagg = dyn["nagg"]
        beta_x = dyn["beta_x"]
        beta_t = dyn["beta_t"]
    else:
        np_t, np_x, nagg = prms.npatches_t, prms.npatches_x, prms.npatches_tagg
        beta_x, beta_t = prms.beta_x, prms.beta_t

    # site grid: py = step*i < hh, px = step*j < ww  [src/nlkalman.c:586,595]
    ny = (hh - 1) // step + 1
    nx = (ww - 1) // step + 1
    row_start, row_stop = (0, ny) if site_rows is None else site_rows
    row_stop = min(row_stop, (h - psz) // step + 1)
    n_rows = row_stop - row_start
    rb = rows_per_block
    n_blocks = -(-n_rows // rb)
    if qy_bounds is None:
        qy_lo, qy_hi = 0, hh
    else:
        qy_lo, qy_hi = qy_bounds[0], qy_bounds[1]

    # ---- dense patch transforms ------------------------------------------
    x_img = basic if has_basic else cur
    xd = dct_image_all_patches(x_img, psz)
    nd = dct_image_all_patches(cur, psz) if has_basic else xd
    if has_prev:
        dd = dct_image_all_patches(prev, psz)
        pval = patch_validity(prev_valid, psz)
    else:
        dd = None
        pval = None

    # padded arrays for band slicing: rows [step*r0, step*r0 + BH); the
    # column pad is phase-aligned (multiple of step) so the phase split
    # makes all window slices contiguous
    bh = step * (rb - 1) + 2 * rad + 1
    pad_rows = rad + step * (row_start + n_blocks * rb) + bh  # generous cover
    pad_l = -(-rad // step) * step
    need_c = step * (nx - 1) + pad_l + rad + 1
    pad_r = (-(-need_c // step)) * step - ww
    wdt = jnp.bfloat16 if window_dtype == "bfloat16" else cur.dtype
    pad_spec = [(rad, pad_rows), (pad_l, pad_r), (0, 0)]
    xd_p = _phase_cols(jnp.pad(xd, pad_spec), step).astype(wdt)
    dd_p = _phase_cols(jnp.pad(dd, pad_spec), step).astype(wdt) if has_prev else None
    pv_p = (
        _phase_cols(jnp.pad(pval, [(rad, pad_rows), (pad_l, pad_r)]), step)
        if has_prev else None
    )

    # offset tables (oy-major)
    oyv, oxv = np.meshgrid(
        np.arange(-rad, rad + 1), np.arange(-rad, rad + 1), indexing="ij"
    )
    oyv = oyv.reshape(-1)
    oxv = oxv.reshape(-1)
    in_rad_t = jnp.asarray(
        (np.abs(oyv) <= rad_t) & (np.abs(oxv) <= rad_t)
    )  # (O,)
    oy_j = jnp.asarray(oyv, jnp.int32)
    ox_j = jnp.asarray(oxv, jnp.int32)

    # per-site grids within a block
    iy = jnp.arange(rb, dtype=jnp.int32)[:, None]            # (rb, 1)
    jx = jnp.arange(nx, dtype=jnp.int32)[None, :]            # (1, nx)
    px_all = step * jx                                       # (1, nx)

    # phase decomposition of offsets: delta = phase + step*shift
    phases = [(int(d) % step, int(d) // step) for d in range(-rad, rad + 1)]
    shift_lo = min(s for _, s in phases)
    shift_hi = max(s for _, s in phases)
    n_sh = shift_hi - shift_lo + 1                           # local rows per phase

    nyp = row_start + n_blocks * rb + n_sh + 2               # phase-plane rows
    nxp = nx + n_sh + 2

    n_acc = 3 if (mode == "smooth") else 2                   # gain/bias(/d)
    c_all = n_acc * f + 1                                    # fused channels
    # + varying zero so the scan carry inherits shard_map varying axes
    g_ph = jnp.zeros((step, step, nyp, nxp, c_all), cur.dtype) + cur.ravel()[0] * 0

    # offset axis padded to a multiple of step so a reshape separates
    # (shift, phase): delta + step*(-shift_lo) = step*shift_idx + phase
    n_pad1 = step * n_sh                                     # padded 1-D offsets
    off_front = (-shift_lo) * step - rad                     # zeros before delta=-rad
    shift_pairs = jnp.asarray(
        [(sy, sx) for sy in range(n_sh) for sx in range(n_sh)], jnp.int32
    )

    inf_b = jnp.asarray(_INF_BITS, jnp.int32)

    def block_body(carry, sr0):
        # sr0 = first site-row index of this block
        g_acc = carry
        row0 = step * sr0

        band_x = jax.lax.dynamic_slice(
            xd_p, (row0, 0, 0, 0), (bh, step, xd_p.shape[2], f)
        )
        wx = _build_window(band_x, rb, nx, rad, step, pad_l)   # (O, rb, nx, F)
        xp = wx[(rad * n_off1) + rad].astype(cur.dtype)        # (rb, nx, F) center
        wc = (wx - wx[(rad * n_off1) + rad][None]).astype(cur.dtype)
        dist = jnp.sum(wc * wc, axis=-1) * (1.0 / f)           # (O, rb, nx)

        # candidate validity: global bounds + (temporal) radius
        py_site = step * (sr0 + iy)                            # (rb, 1)
        qy = py_site[None] + oy_j[:, None, None]               # (O, rb, 1)
        qx = px_all[None] + ox_j[:, None, None]                # (O, 1, nx)
        site_ok = (
            ((sr0 + iy) < row_stop)
            & (py_site >= qy_lo) & (py_site < qy_hi)
        )                                                      # (rb, 1)
        cand = (qy >= qy_lo) & (qy < qy_hi) & (qx >= 0) & (qx < ww) & site_ok[None]

        if has_prev:
            band_d = jax.lax.dynamic_slice(
                dd_p, (row0, 0, 0, 0), (bh, step, dd_p.shape[2], f)
            )
            wd = _build_window(band_d, rb, nx, rad, step, pad_l)
            band_v = jax.lax.dynamic_slice(
                pv_p.astype(cur.dtype), (row0, 0, 0), (bh, step, pv_p.shape[2])
            )
            wv = _build_window(
                band_v[..., None], rb, nx, rad, step, pad_l
            )[..., 0] > 0.5
            prev_p = wv[(rad * n_off1) + rad]                  # (rb, nx)
            cand = cand & jnp.where(prev_p[None], in_rad_t[:, None, None], True) \
                if mode == "filter" else cand
            prevc = wv & cand & prev_p[None]
            if prms.dista_lambda != 1.0:
                # LAMBDA_DISTANCE variant (src/nlkalman.c:647-684): when
                # both the center's and the candidate's previous patches
                # are valid, blend the current-frame distance with the
                # previous-frame (warped denoised) distance
                lam = prms.dista_lambda
                dd0 = (wd - wd[(rad * n_off1) + rad][None]).astype(cur.dtype)
                dist_d = jnp.sum(dd0 * dd0, axis=-1) * (1.0 / f)
                dist = jnp.where(
                    wv & prev_p[None], lam * dist + (1.0 - lam) * dist_d,
                    dist,
                )
        else:
            wd = None
            prev_p = jnp.zeros((rb, nx), bool)
            prevc = jnp.zeros(cand.shape, bool)

        if prms.dista_th > 0.0:
            # non-K threshold selection (src/nlkalman.h:32, nlkalman.c:528,
            # 633,712-717): noise-corrected clamped distance, every patch
            # within dista_th^2 is selected (no group-size caps)
            dista_sigma2 = 0.0 if has_basic else 2.0 * sigma2
            dist = jnp.maximum(dist - dista_sigma2, 0.0)

        bits = jnp.where(cand, jax.lax.bitcast_convert_type(dist, jnp.int32), inf_b)
        bits2 = bits.reshape(n_off, rb * nx)
        pbits2 = jnp.where(prevc, bits, inf_b).reshape(n_off, rb * nx)

        if prms.dista_th > 0.0:
            th_c = jnp.asarray(
                np.float32(prms.dista_th * prms.dista_th).view(np.int32),
                jnp.int32,
            )
            th1 = jnp.full((rb, nx), th_c, jnp.int32)
            thp = th1
            tha = th1
        else:
            k1 = jnp.where(prev_p, np_t, np_x).reshape(-1).astype(jnp.int32)
            th1 = _kth_smallest_bits(bits2, k1).reshape(rb, nx)
            thp = _kth_smallest_bits(
                pbits2, jnp.full((rb * nx,), nagg, jnp.int32)
            ).reshape(rb, nx)
            tha = _kth_smallest_bits(
                bits2, jnp.full((rb * nx,), nagg, jnp.int32)
            ).reshape(rb, nx)

        # threshold mode has no group-size caps (non-K build)
        nagg_f = nagg * 1.0 if prms.dista_th <= 0.0 else float(n_off)
        bmat = bits2.reshape(n_off, rb, nx)
        sel1 = cand & (bmat <= th1[None])
        m0sel = prevc & (bmat <= thp[None])
        memsp = sel1 & (bmat <= tha[None])

        np1 = jnp.sum(sel1, axis=0).astype(cur.dtype)          # (rb, nx)
        np0 = jnp.sum(sel1 & prevc, axis=0).astype(cur.dtype)
        # first-nagg-prev-in-distance-order == (nagg-th smallest over ALL
        # prev candidates) intersected with the selected set
        m0sel = m0sel & sel1
        np1s = jnp.maximum(np1, 1.0)
        np0s = jnp.maximum(np0, 1.0)

        s1f = sel1.astype(cur.dtype)
        m1c = jnp.einsum("ors,orsf->rsf", s1f, wc) / np1s[..., None]
        e2 = jnp.einsum("ors,orsf->rsf", s1f, wc * wc) / np1s[..., None]
        v1 = jnp.maximum(e2 - m1c * m1c, 0.0)
        m1_mean = m1c + xp

        if has_prev:
            spf = (sel1 & prevc).astype(cur.dtype)
            wdc = wd - xp[None]
            m0vc = jnp.einsum("ors,orsf->rsf", spf, wdc) / np0s[..., None]
            e0 = jnp.einsum("ors,orsf->rsf", spf, wdc * wdc) / np0s[..., None]
            v0 = jnp.maximum(e0 - m0vc * m0vc, 0.0)
            dxw = wd - wx
            v01 = jnp.einsum("ors,orsf->rsf", spf, dxw * dxw) / np0s[..., None]
            m0f = m0sel.astype(cur.dtype)
            m0n = jnp.minimum(np0s, nagg_f)
            m0 = jnp.einsum("ors,orsf->rsf", m0f, wd) / m0n[..., None]
        else:
            v0 = v01 = m0 = jnp.zeros_like(v1)

        temporal = (np0 > 0.0)[..., None]                      # (rb, nx, 1)
        sub = 0.0 if has_basic else sigma2

        if mode == "filter":
            v_t = v0 + jnp.maximum(0.0, v01 - sub)
            a_t = v_t / (v_t + beta_t * sigma2)
            vp_t = jnp.sum((1.0 - a_t * a_t) * v_t + a_t * a_t * sigma2, axis=-1)
            v_x = jnp.maximum(0.0, v1 - sub)
            a_x = v_x / (v_x + beta_x * sigma2)
            vp_x = jnp.sum(a_x * v_x, axis=-1)
            a = jnp.where(temporal, a_t, a_x)
            m_ref = jnp.where(temporal, m0, m1_mean)
            mem = jnp.where(temporal[None, ..., 0], m0sel, memsp)  # (O, rb, nx)
            nagg_eff = jnp.minimum(jnp.where(np0 > 0, np0, np1), nagg_f)
            vp = jnp.where(temporal[..., 0], vp_t, vp_x) * nagg_eff
            wgt = 1.0 / jnp.maximum(vp, 1e-6)
            # filtered dct at member q: a (.) Nd[q] + (1-a) (.) m_ref
            acc_specs = (a, (1.0 - a) * m_ref)                 # gain on Nd; bias
        else:
            b = beta_t
            denom = v1 + b * v01
            a = jnp.where(denom > 0.0, v1 / jnp.maximum(denom, 1e-30), 0.0)
            vp = jnp.sum(
                (1.0 - a * a) * v1 + a * a * jnp.maximum(v0 - b * v01, 0.0),
                axis=-1,
            ) * jnp.minimum(np0, nagg_f)
            wgt = 1.0 / jnp.maximum(vp, 1e-6)
            mem = m0sel
            # filtered dct: (1-a) (.) Nd[q] + a (.) Dd[q]
            acc_specs = ((1.0 - a), jnp.zeros_like(a), a)      # gain_n, bias, gain_d

        memw = mem.astype(cur.dtype) * wgt[None]               # (O, rb, nx)

        # ---- phase-decomposed dense aggregation --------------------------
        # fused per-site value channels: [gain | bias | (gain_d) | 1]
        specs_all = jnp.concatenate(
            [a for a in acc_specs] + [jnp.ones((rb, nx, 1), cur.dtype)],
            axis=-1,
        )                                                      # (rb, nx, c_all)

        # reorganize the member weights by (shift, phase) via pad + reshape
        u24 = jnp.zeros((n_pad1, n_pad1, rb, nx), cur.dtype)
        u24 = jax.lax.dynamic_update_slice(
            u24, memw.reshape(n_off1, n_off1, rb, nx),
            (off_front, off_front, 0, 0),
        )
        u6 = u24.reshape(n_sh, step, n_sh, step, rb, nx)

        if mode == "smooth":
            # passthrough where np0 == 0: gain 1 on Nd at the center offset
            # with weight 1e6 [src/nlkalman.c:1795-1804]; expressed as an
            # extra member weight at the center offset so both aggregation
            # backends handle it uniformly.  The center's member weight and
            # the passthrough are mutually exclusive (np0==0 => no members).
            pmask = ((np0 == 0.0) & site_ok).astype(cur.dtype) * 1e6
            c_sh = -shift_lo
            u6 = u6.at[c_sh, 0, c_sh, 0].add(pmask)
            # passthrough uses gain-1 on Nd: since member specs at np0==0
            # sites are irrelevant (no members), override specs there
            specs_all = jnp.where(
                (np0 == 0.0)[..., None],
                jnp.concatenate(
                    [jnp.ones((rb, nx, f), cur.dtype)]
                    + [jnp.zeros((rb, nx, f), cur.dtype)] * (n_acc - 1)
                    + [jnp.ones((rb, nx, 1), cur.dtype)],
                    axis=-1,
                ),
                specs_all,
            )

        # statically-unrolled pad+add chain (fusable; no scan-carry spills)
        pr = rb + n_sh + 1
        pc = nx + n_sh + 1
        loc = jnp.zeros(
            (step, step, rb + n_sh + 1, nx + n_sh + 1, c_all), cur.dtype
        )
        for sy in range(n_sh):
            for sx in range(n_sh):
                contrib = (
                    u6[sy, :, sx, :][..., None] * specs_all[None, None]
                )                                              # (step, step, rb, nx, c_all)
                loc = loc + jnp.pad(
                    contrib,
                    ((0, 0), (0, 0), (sy, pr - rb - sy), (sx, pc - nx - sx), (0, 0)),
                )

        # fold the local buffer into the global phase planes
        sl = jax.lax.dynamic_slice(
            g_acc, (0, 0, sr0, 0, 0),
            (step, step, rb + n_sh + 1, nxp, c_all),
        )
        sl = sl.at[:, :, :, : nx + n_sh + 1].add(loc)
        g_acc = jax.lax.dynamic_update_slice(g_acc, sl, (0, 0, sr0, 0, 0))

        return g_acc, None

    g_acc, _ = jax.lax.scan(
        block_body, g_ph,
        row_start + jnp.arange(n_blocks, dtype=jnp.int32) * rb,
    )

    # ---- un-phase: phase plane (py_ph, px_ph, i, j) -> q = (step*(i+shift_lo)
    # + py_ph, step*(j+shift_lo) + px_ph) ... local index ri = sh - shift_lo,
    # so patch row = step*(r0+i_site) + dy = step*(idx + shift_lo) + phase.
    def unphase(gp):
        # gp: (step, step, nyp, nxp, ...) -> (step*nyp, step*nxp, ...)
        t = jnp.moveaxis(gp, (0, 1), (1, 3))                   # (nyp, step, nxp, step, ...)
        t = t.reshape((step * nyp, step * nxp) + gp.shape[4:])
        # patch position 0 corresponds to plane index shift_lo (negative)
        start = -shift_lo * step
        return t[start : start + hh, start : start + ww]

    g_all = unphase(g_acc)
    g_fields = [g_all[..., i * f : (i + 1) * f] for i in range(n_acc)]
    w_field = g_all[..., n_acc * f]
    return finalize_fields(
        g_fields, w_field, nd, dd, mode, psz, cur, return_accum
    )


def finalize_fields(fields, w_field, nd, dd, mode, psz, cur, return_accum):
    """Shared tail of the dense engines: turn aggregated DCT-domain
    gain/bias fields into the filtered frame.

    fields: [gain(, bias(, gain_d))] each (hh, ww, F); w_field (hh, ww).
    One inverse DCT (MXU matmul) + window overlap-add over the whole frame,
    then normalize-or-copy-noisy [src/nlkalman.c:940-942].
    """
    h, w, ch = cur.shape
    hh, ww = h - psz + 1, w - psz + 1

    if mode == "filter":
        fd = fields[0] * nd + fields[1]
    elif dd is None:
        # smoother without a next frame: gain_d is identically zero
        # (full passthrough), so the dd term vanishes
        fd = fields[0] * nd + fields[1]
    else:
        fd = fields[0] * nd + fields[1] + fields[2] * dd

    bk = jnp.asarray(_ortho_basis_kron_np(psz), cur.dtype)     # (K, K) flat basis
    fdr = fd.reshape(hh, ww, ch, psz * psz)
    pix = jnp.einsum("rscK,Kp->rscp", fdr, bk)                 # idct: x = B^T F
    w1 = _window_1d("gaussian", psz)
    wnp = np.outer(w1, w1)

    out = jnp.zeros((h, w, ch), cur.dtype)
    agg = jnp.zeros((h, w), cur.dtype)
    for dy in range(psz):
        for dx in range(psz):
            wv = float(wnp[dy, dx])
            out = out.at[dy : dy + hh, dx : dx + ww].add(
                wv * pix[..., :, dy * psz + dx]
            )
            agg = agg.at[dy : dy + hh, dx : dx + ww].add(wv * w_field)

    if return_accum:
        return out, agg

    covered = agg > 1e-6
    return jnp.where(covered[..., None], out / jnp.maximum(agg, 1e-6)[..., None], cur)


def auto_rows_per_block(w: int, ch: int, psz: int, rad: int,
                        budget_bytes: int = 160 * 1024 * 1024) -> int:
    """Block height bounding the (O, rb, nx, F) window tensors."""
    nx = (w - psz) // (psz // 2) + 1
    per_row = ((2 * rad + 1) ** 2) * nx * ch * psz * psz * 4
    return max(1, min(4, budget_bytes // max(per_row, 1)))

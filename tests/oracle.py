"""Loop-level numpy oracle of the reference NL-Kalman kernels.

An independent, direct (slow) implementation of the semantics of
nlkalman_filter_frame (src/nlkalman.c:518-951) and nlkalman_smooth_frame
(src/nlkalman.c:1409-1865), written from the algorithm description, with
one deliberate difference: the "processed mask" scan-order shortcut
(src/nlkalman.c:597-600) is disabled so every stride-psz/2 site is
processed — matching the deterministic dense TPU formulation.

Used by tests to validate the JAX implementation site-for-site.
"""

from __future__ import annotations

import numpy as np


def _ortho_basis(n: int) -> np.ndarray:
    k = np.arange(n)[:, None].astype(np.float64)
    i = np.arange(n)[None, :].astype(np.float64)
    d = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    d[0] /= np.sqrt(2.0)
    return d


def _dct2(p: np.ndarray, d: np.ndarray) -> np.ndarray:
    """(psz, psz, ch) -> (ch, psz, psz) DCT coefficients."""
    return np.einsum("ki,ijc,lj->ckl", d, p, d)


def _idct2(c: np.ndarray, d: np.ndarray) -> np.ndarray:
    """(ch, psz, psz) -> (psz, psz, ch): x[i,j] = sum_kl D[k,i] F[k,l] D[l,j]."""
    return np.einsum("ki,ckl,lj->ijc", d, c, d)


def _gauss_window(psz: int) -> np.ndarray:
    n2 = (psz - 1) / 2.0
    x = (np.arange(psz) - n2) / n2 / 0.4
    w1 = np.exp(-0.5 * x * x)
    return np.outer(w1, w1)


def nlk_pass_oracle(cur, prev, pvalid, basic, sigma, prms, mode):
    """Reference-semantics pass (mask-skip disabled).

    cur:   (H, W, C) noisy (filter) / filtered (smoother) frame, OPP space
    prev:  warped previous denoised / next smoothed frame or None
    pvalid:(H, W) bool pixel validity of prev
    basic: basic estimate or None
    """
    cur = np.asarray(cur, np.float64)
    h, w, ch = cur.shape
    psz = prms.patch_sz
    step = psz // 2
    sigma2 = sigma * sigma
    d = _ortho_basis(psz)
    wwin = _gauss_window(psz)
    x_img = np.asarray(basic, np.float64) if basic is not None else cur
    out = np.zeros_like(cur)
    agg = np.zeros((h, w))
    hh, ww = h - psz + 1, w - psz + 1
    nagg = prms.npatches_tagg

    for py in range(0, hh, step):
        for px in range(0, ww, step):
            prev_p = prev is not None and bool(
                pvalid[py : py + psz, px : px + psz].all()
            )
            num = prms.npatches_t if prev_p else prms.npatches_x
            np0 = np1 = 0
            M1 = np.zeros((ch, psz, psz))
            V1 = np.zeros((ch, psz, psz))
            M0 = np.zeros((ch, psz, psz))
            M0V = np.zeros((ch, psz, psz))
            V0 = np.zeros((ch, psz, psz))
            V01 = np.zeros((ch, psz, psz))
            pg1 = [None] * max(nagg, 1)
            pg0 = [None] * max(nagg, 1)
            coords = [None] * max(nagg, 1)

            if num > 1:
                if mode == "filter":
                    wsz = prms.search_sz_t if prev_p else prms.search_sz_x
                else:
                    wsz = prms.search_sz_t
                y0, y1 = max(py - wsz, 0), min(py + wsz, hh - 1)
                x0, x1 = max(px - wsz, 0), min(px + wsz, ww - 1)
                tgt = x_img[py : py + psz, px : px + psz]
                cands = []
                for qy in range(y0, y1 + 1):
                    for qx in range(x0, x1 + 1):
                        dd2 = np.sum(
                            (x_img[qy : qy + psz, qx : qx + psz] - tgt) ** 2
                        )
                        cands.append((max(dd2 / (psz * psz * ch), 0.0), qy, qx))
                order = sorted(range(len(cands)), key=lambda i: cands[i][0])
                take = min(num, len(cands))

                for oi in order[:take]:
                    _, qy, qx = cands[oi]
                    prev_q = prev is not None and bool(
                        pvalid[qy : qy + psz, qx : qx + psz].all()
                    )
                    prv = prev_p and prev_q
                    xq = _dct2(x_img[qy : qy + psz, qx : qx + psz], d)
                    dq = (
                        _dct2(
                            np.where(
                                pvalid[qy : qy + psz, qx : qx + psz, None],
                                prev[qy : qy + psz, qx : qx + psz],
                                0.0,
                            ),
                            d,
                        )
                        if prv
                        else np.zeros((ch, psz, psz))
                    )
                    np1 += 1
                    if prv:
                        np0 += 1
                    # Welford (src/nlkalman.c:746-795)
                    delta = xq - M1
                    M1 = M1 + delta / np1
                    V1 = V1 + delta * (xq - M1)
                    if prv:
                        delta0 = dq - M0V
                        M0V = M0V + delta0 / np0
                        V0 = V0 + delta0 * (dq - M0V)
                        V01 = V01 + (dq - xq) ** 2
                        if np0 <= nagg:
                            coords[np0 - 1] = (qy, qx)
                            M0 = M0 + (dq - M0) / np0
                            pg1[np0 - 1] = _dct2(
                                cur[qy : qy + psz, qx : qx + psz], d
                            )
                            pg0[np0 - 1] = dq
                    elif mode == "filter" and np1 <= nagg:
                        coords[np1 - 1] = (qy, qx)
                        pg1[np1 - 1] = _dct2(cur[qy : qy + psz, qx : qx + psz], d)

                V1 = V1 / np1
                if np0:
                    V0 = V0 / np0
                    V01 = V01 / np0

            # ---- update + aggregation -----------------------------------
            sub = 0.0 if basic is not None else sigma2
            vp = 0.0
            if mode == "filter":
                nagg_eff = min(np0 if np0 else np1, nagg)
                filtered = []
                if np0 > 0:
                    v = V0 + np.maximum(0.0, V01 - sub)
                    a = v / (v + prms.beta_t * sigma2)
                    for n in range(nagg_eff):
                        vp += np.sum((1 - a * a) * v + a * a * sigma2)
                        filtered.append(a * pg1[n] + (1 - a) * M0)
                else:
                    v = np.maximum(0.0, V1 - sub)
                    a = v / (v + prms.beta_x * sigma2)
                    for n in range(nagg_eff):
                        vp += np.sum(a * v)
                        filtered.append(a * pg1[n] + (1 - a) * M1)
                wgt = 1.0 / max(vp, 1e-6)
                for n in range(nagg_eff):
                    qy, qx = coords[n]
                    patch = _idct2(filtered[n], d)
                    out[qy : qy + psz, qx : qx + psz] += (
                        wgt * wwin[..., None] * patch
                    )
                    agg[qy : qy + psz, qx : qx + psz] += wgt * wwin
            else:  # smoother
                nagg_eff = min(np0, nagg)
                b = prms.beta_t
                if np0 > 0:
                    a = V1 / (V1 + b * V01)
                    for n in range(nagg_eff):
                        vp += np.sum(
                            (1 - a * a) * V1
                            + a * a * np.maximum(V0 - b * V01, 0.0)
                        )
                    wgt = 1.0 / max(vp, 1e-6)
                    for n in range(nagg_eff):
                        qy, qx = coords[n]
                        patch = _idct2((1 - a) * pg1[n] + a * pg0[n], d)
                        out[qy : qy + psz, qx : qx + psz] += (
                            wgt * wwin[..., None] * patch
                        )
                        agg[qy : qy + psz, qx : qx + psz] += wgt * wwin
                else:
                    wgt = 1.0 / 1e-6
                    patch = cur[py : py + psz, px : px + psz]
                    out[py : py + psz, px : px + psz] += (
                        wgt * wwin[..., None] * patch
                    )
                    agg[py : py + psz, px : px + psz] += wgt * wwin

    covered = agg > 1e-6
    out = np.where(covered[..., None], out / np.maximum(agg, 1e-6)[..., None], cur)
    return out

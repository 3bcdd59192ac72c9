"""Fully-fused Pallas TPU kernel for the NL-Kalman filter/smoother (v3).

Same semantics as core.engine.dense_pass_v2 (itself validated against the
C reference, src/nlkalman.c:518-951 / :1409-1865), but the entire hot
chain — candidate-window distances, k-th-smallest bit-bisection
selection, masked group statistics, Kalman/Wiener update, and the
linearity-trick gain/bias aggregation — runs inside ONE Pallas kernel
with everything resident in VMEM.  The v2 XLA engine materializes
(O, rb, nx, F) window tensors in HBM (hundreds of MB per block); this
kernel never materializes a window at all: candidates are lane-rolled
views of a DCT-image band held in VMEM.

Layout (v5e-tuned; VMEM ~128 MB):

- HBM holds only RAW pixel planes, phase-split by column (col = step*j
  + p) as (rows, step, 8, C4) with sites along lanes; site s lives at
  lane j = s + pad_l/step.  The patch DCT runs IN-KERNEL: each grid
  step DMAs `step + psz - 1` fresh raw rows (a few hundred KB instead
  of a multi-MB DCT band) and one MXU matmul per new band row turns
  nshift lane-rolled raw copies into all `step` phases' DCT
  coefficients at once (_inkernel_dct_basis_np — the reference's
  MATPROD intent, src/nlkalman.c:135,190-191); d-band patch validity
  falls out of the same matmul as the patch-footprint mean of the 0/1
  pixel-validity plane.
- the DCT bands are CIRCULAR VMEM buffers: patch row q lives at slot
  (q + rad) % bh_c; rows are written once and read for bh_c/step grid
  steps — no re-DMA, no band shifting.
- grid = one step per site ROW (stride step).  A candidate at offset
  (oy, ox) is band[slot(oy), (ox+pad_l)%step] lane-rolled by
  (ox+pad_l)//step - base: a single VPU rotate, no gather, no
  unaligned slice.
- selection = exact bisection on the int32 bits of the distances
  (engine.py:_kth_smallest_bits), three thresholds per site.
- statistics/update accumulate in f32 scratch; per-offset loops skip
  work via predication: when every site in the row has a valid temporal
  patch (the common case), only the (2*rad_t+1)^2 inner offsets run.
- aggregation accumulates DCT-domain gain/bias fields into a circular
  VMEM plane buffer (rows live for 2*rad+1 steps); retired patch rows
  are finalized IN-KERNEL (fd = gain (.) nd + bias, inverse DCT on the
  MXU, separable-window fold into a rolling pixel accumulator), so the
  kernel streams out finished PIXEL rows — the output is h x w x (ch+1)
  instead of the ~1 GB gain/bias fields, and the entire XLA finalize
  tail disappears.

Supported: even patch_sz, any channel count that fits VMEM (auto
dispatch falls back to v2 otherwise), filter/smooth, all has_prev /
has_basic combinations, and the sharded path (site_rows/qy_bounds with
the phantom-site center gate; parallel/spatial.py dispatches
engine="auto" -> pallas on TPU when the VMEM plan fits).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.dct import _ortho_basis_kron_np
from ..ops.windows import _window_1d
from ..params import NLKParams

_INF_BITS = int(np.float32(np.inf).view(np.int32))


def _cdiv(a, b):
    return -(-a // b)


def _nshift(psz: int) -> int:
    step = psz // 2
    return (step + psz - 2) // step + 1


@functools.lru_cache(maxsize=None)
def _inkernel_dct_basis_np(psz: int, blk: int) -> np.ndarray:
    """Basis for the in-kernel patch DCT (the reference's MATPROD intent,
    src/nlkalman.c:135,190-191, realized as ONE MXU matmul per band row).

    Shape (step*blk, psz*nshift*step).  The matmul input is the "rolled
    element" matrix E[dy*nshift*step + m, lane] = raw[q+dy, (m%step),
    lane + m//step] (built by ``nshift`` lane-rolls of the raw band); for
    the phase-pp patch at site lane j, element (dy, dx) sits at column
    m = pp + dx.  Output rows per phase block: [0, psz^2) = orthonormal
    2-D DCT coefficients, row psz^2 = patch-footprint MEAN of the channel
    (== validity fraction when fed the 0/1 validity plane), rest zero.
    """
    step = psz // 2
    ncol = psz * _nshift(psz) * step
    b2 = _ortho_basis_kron_np(psz)              # (psz^2, psz^2) [k, dy*psz+dx]
    out = np.zeros((step * blk, ncol), np.float64)
    inv = 1.0 / (psz * psz)
    for pp in range(step):
        for dy in range(psz):
            for dx in range(psz):
                mcol = dy * (_nshift(psz) * step) + pp + dx
                out[pp * blk : pp * blk + psz * psz, mcol] += b2[:, dy * psz + dx]
                out[pp * blk + psz * psz, mcol] += inv
    return out.astype(np.float32)


def _roll(x, sh, interpret):
    """Lane roll: out[..., j] = x[..., (j - sh) mod n].

    pltpu.roll on bf16 vectors wider than one vreg (e.g. 64x512) fails to
    compile on v5e ("tpu.dynamic_rotate" lowering), while jnp.roll lowers
    correctly for bf16 at any width (probed on hardware; NB a manual
    two-slice concatenate MIScompiles for bf16 — do not use).  f32 keeps
    the native rotate.
    """
    sh = sh % x.shape[-1]
    if x.dtype == jnp.bfloat16:
        # upcast first: the native rotate is f32-only at multi-vreg
        # widths, and the bf16 jnp.roll lowering (slices+concats) is slow
        x = x.astype(jnp.float32)
    if sh == 0:
        return x
    if interpret:
        return jnp.roll(x, sh, axis=-1)
    return pltpu.roll(x, sh, axis=len(x.shape) - 1)


def _fused_pass_kernel(
    *refs,
    cfg: dict,
):
    """One grid step = one site row (or a flush step)."""
    (step, f, rad, rad_t, n_off1, hh, ww, ns, j_base, c4p, bh, ah,
     n_rows, n_steps, mode, has_prev, has_basic, np_t, np_x, nagg,
     sigma2, beta_x, beta_t, sub, interpret, fw_pad, ch, ph, ch_pad) = (
        cfg["step"], cfg["f"], cfg["rad"], cfg["rad_t"], cfg["n_off1"],
        cfg["hh"], cfg["ww"], cfg["ns"], cfg["j_base"], cfg["c4p"],
        cfg["bh"], cfg["ah"], cfg["n_rows"], cfg["n_steps"], cfg["mode"],
        cfg["has_prev"], cfg["has_basic"], cfg["np_t"], cfg["np_x"],
        cfg["nagg"], cfg["sigma2"], cfg["beta_x"], cfg["beta_t"],
        cfg["sub"], cfg["interpret"], cfg["fw_pad"], cfg["ch"], cfg["ph"],
        cfg["ch_pad"],
    )
    n_off = n_off1 * n_off1
    smooth = mode == "smooth"
    f32 = jnp.float32
    psz = 2 * step
    psz2 = psz * psz

    bh_c, nrr, blk = cfg["bh_c"], cfg["nrr"], cfg["blk"]
    sr_lo, sr_hi = cfg["sr_lo"], cfg["sr_hi"]
    nsh = _nshift(psz)
    # debug-only phase attribution (BNLK_KERNEL_SKIP): the pass is ONE
    # kernel, invisible to the profiler — peeling phases (F=band fill,
    # A=distances, B=selection, C=stats, E=aggregation, G=IDCT/fold)
    # attributes its cost.  Output is garbage when any phase is skipped.
    skip = cfg["skip"]

    i = 0
    qyb_ref = refs[i]; i += 1            # SMEM (2,): global patch-row bounds
    dyn_ref = refs[i] if cfg["dyn"] else None
    i += 1 if cfg["dyn"] else 0          # SMEM (8,) f32 traced scalars
    xraw_hbm = refs[i]; i += 1
    draw_hbm = refs[i] if has_prev else None; i += 1 if has_prev else 0
    nraw_hbm = refs[i] if has_basic else None; i += 1 if has_basic else 0
    dctb_ref = refs[i]; i += 1            # (step*blk, tap) in-kernel DCT basis
    bk_ref = refs[i]; i += 1              # (psz2, psz2) idct basis, dx-major
    win_ref = refs[i]; i += 1             # (psz, 128): col 0 = 1-D window
    opix_ref = refs[i]; i += 1
    band_x = refs[i]; i += 1
    band_d = refs[i] if has_prev else None; i += 1 if has_prev else 0
    band_n = refs[i] if has_basic else None; i += 1 if has_basic else 0
    raw_x = refs[i]; i += 1
    raw_d = refs[i] if has_prev else None; i += 1 if has_prev else 0
    raw_n = refs[i] if has_basic else None; i += 1 if has_basic else 0
    el_scr = refs[i]; i += 1
    bits_s = refs[i]; i += 1
    pbits_s = refs[i] if has_prev else None; i += 1 if has_prev else 0
    acc_m1c = refs[i]; i += 1
    acc_e2 = refs[i]; i += 1
    if has_prev:
        acc_m0v = refs[i]; i += 1
        acc_e0 = refs[i]; i += 1
        acc_v01 = refs[i]; i += 1
        acc_m0 = refs[i]; i += 1
    nrows_s = refs[i]; i += 1
    agg_g = refs[i]; i += 1
    agg_bw = refs[i]; i += 1
    agg_gd = refs[i] if smooth else None; i += 1 if smooth else 0
    pix_acc = refs[i]; i += 1
    sem = refs[i]; i += 1
    assert i == len(refs)

    if cfg["dyn"]:
        np_t = dyn_ref[0].astype(jnp.int32)
        np_x = dyn_ref[1].astype(jnp.int32)
        nagg = dyn_ref[2].astype(jnp.int32)
        beta_x = dyn_ref[3]
        beta_t = dyn_ref[4]

    sr = pl.program_id(0)
    inv_f = 1.0 / float(f)
    inf_b = jnp.asarray(_INF_BITS, jnp.int32)

    # static per-ox lane masks: lane j holds site s = j - j_base;
    # candidate col qx = step*s + ox must lie in [0, ww)
    li = jax.lax.broadcasted_iota(jnp.int32, (1, c4p), 1)

    def cand_x_mask(oxi):
        ox = oxi - rad
        lo_j = j_base + max(0, _cdiv(-ox, step))
        hi_j = j_base + min(ns - 1, (ww - 1 - ox) // step)
        return (li >= lo_j) & (li <= hi_j)

    site_m = (li >= j_base) & (li < j_base + ns)
    # column-strip ownership: only OWN site lanes aggregate (halo lanes
    # are real local sites whose output the neighboring strip produces)
    j_own_lo, j_own_hi = cfg["j_own"]
    own_m = (li >= j_base + j_own_lo) & (li < j_base + min(j_own_hi, ns))
    own_f32 = jnp.where(own_m, 1.0, 0.0)

    @pl.when(sr == 0)
    def _init():
        agg_g[:] = jnp.zeros_like(agg_g)
        agg_bw[:] = jnp.zeros_like(agg_bw)
        if smooth:
            agg_gd[:] = jnp.zeros_like(agg_gd)
        pix_acc[:] = jnp.zeros_like(pix_acc)

    # ---- circular band fill: raw pixel rows are DMAd in (a few hundred
    # KB/step instead of the multi-MB DCT band) and the patch DCT runs
    # IN-KERNEL as one MXU matmul per band row (the reference's MATPROD
    # intent, src/nlkalman.c:135,190-191).  Band row of patch row q lives
    # at circular slot (q + rad) % bh_c. ----
    def bslot(oyi):
        """Band slot of the row at relative offset oyi (patch row
        step*sr + oyi - rad)."""
        return jnp.mod(step * sr + oyi, bh_c)

    def fill_bands(q0):
        """DCT patch rows [q0, q0+step) of every input into the bands."""
        cps = [
            pltpu.make_async_copy(
                xraw_hbm.at[pl.ds(q0 + rad, nrr)], raw_x, sem.at[0]
            )
        ]
        if has_prev:
            cps.append(pltpu.make_async_copy(
                draw_hbm.at[pl.ds(q0 + rad, nrr)], raw_d, sem.at[1]
            ))
        if has_basic:
            cps.append(pltpu.make_async_copy(
                nraw_hbm.at[pl.ds(q0 + rad, nrr)], raw_n, sem.at[2]
            ))
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

        def dct_rows(raw_ref, band_ref, nch, with_valid):
            # lane-rolled raw copies: element (dy, m) of patch row q0+i
            # = rolled[m//step][i+dy, m%step, c]
            rolled = [
                _roll(raw_ref[:], -s, interpret) for s in range(nsh)
            ]
            for i2 in range(step):
                slot = jnp.mod(q0 + i2 + rad, bh_c)
                ncv = nch + (1 if with_valid else 0)
                for c in range(ncv):
                    for dy in range(psz):
                        for s in range(nsh):
                            el_scr[c, dy * nsh * step + s * step :
                                   dy * nsh * step + (s + 1) * step] = (
                                rolled[s][i2 + dy, :, c, :]
                            )
                # f32 bands need the multi-pass MXU f32 matmul — the
                # default Mosaic lowering is single-pass bf16 (measured
                # ~1e-2 rel band error on-chip); bf16 bands are rounded
                # anyway so the fast path is fine for them
                prec = (
                    jax.lax.Precision.HIGHEST
                    if band_ref.dtype == jnp.float32 else None
                )
                for c in range(nch):
                    res = jax.lax.dot_general(
                        dctb_ref[:], el_scr[c],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                        precision=prec,
                    )                                  # (step*blk, C4p)
                    for p in range(step):
                        band_ref[slot, p, c * psz2 : (c + 1) * psz2] = (
                            res[p * blk : p * blk + psz2]
                            .astype(band_ref.dtype)
                        )
                if with_valid:
                    resv = jax.lax.dot_general(
                        dctb_ref[:], el_scr[nch],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )
                    fdp = band_ref.shape[2]
                    for p in range(step):
                        # patch valid <=> every pixel valid <=> mean == 1
                        vrow = resv[p * blk + psz2 : p * blk + blk]
                        nv = fdp - nch * psz2
                        band_ref[slot, p, nch * psz2 :] = jnp.where(
                            vrow[:nv] > 0.998, 1.0, 0.0
                        ).astype(band_ref.dtype)

        dct_rows(raw_x, band_x, ch, False)
        if has_prev:
            dct_rows(raw_d, band_d, ch, True)
        if has_basic:
            dct_rows(raw_n, band_n, ch, False)

    if "F" not in skip:
        @pl.when(sr == 0)
        def _prologue_fill():
            def g_body(g, carry):
                fill_bands(g * step - rad)
                return carry
            jax.lax.fori_loop(0, bh_c // step, g_body, 0)

        @pl.when(sr > 0)
        def _front_fill():
            fill_bands(step * (sr - 1 + bh_c // step) - rad)

    # site gate: own row range AND the center patch row within the global
    # bounds (v2's site_ok — a shard's halo can hold real LOCAL patch rows
    # whose global coordinate is out of range; without this gate such
    # phantom sites aggregate into their in-range candidates)
    qy_lo = qyb_ref[0]
    qy_hi = qyb_ref[1]

    @pl.when((sr >= sr_lo) & (sr < min(sr_hi, n_rows))
             & (step * sr >= qy_lo) & (step * sr < qy_hi))
    def _compute():
        xp = band_x[bslot(rad), 0].astype(f32)               # (F, C4p) center
        if has_prev:
            prev_p = band_d[bslot(rad), 0, f : f + 1, :].astype(f32) > 0.5
            if mode == "filter":
                # the spatial-fallback (outer-offset) groups fire only
                # when an OWN site lacks a valid temporal patch — halo
                # lanes never aggregate, and with column strips this
                # confines the frame-edge columns' always-invalid sites
                # (bicubic footprint off-frame) to the edge strips
                all_temp = jnp.all(prev_p | jnp.logical_not(site_m & own_m))
                # per-128-lane-block spatial-fallback flags: the sites
                # that need the outer offsets are typically a handful of
                # frame-edge / occluded lanes, while the row-level
                # predicate fires on EVERY row (the frame edge is in
                # every row).  Phases A and C run the outer groups per
                # active block only (full-width rolls stay shared; the
                # arithmetic and accumulator RMW are vreg-aligned block
                # slices).
                spat_f = jnp.where(
                    site_m & own_m & jnp.logical_not(prev_p), 1.0, 0.0
                )
                blk_need = [
                    jnp.sum(spat_f[:, b * 128:(b + 1) * 128]) > 0.0
                    for b in range(c4p // 128)
                ]
            else:
                all_temp = jnp.asarray(False)
        else:
            prev_p = jnp.zeros((1, c4p), bool)
            all_temp = jnp.asarray(False)
        not_all_temp = jnp.logical_not(all_temp)
        if "O" in skip:
            # profiling-only (BNLK_KERNEL_SKIP=O): statically pretend
            # every row is all-temporal — bounds the total cost of the
            # spatial-fallback/edge predicate-driven work.  Output is
            # wrong wherever a spatial site exists.
            all_temp = jnp.asarray(True)
            not_all_temp = jnp.asarray(False)

        # ---- packed bits layout: the (inner oy, inner ox) offsets live in
        # rows [0, n_ii) so the common all-temporal bisection scans 121
        # rows instead of the legacy interleaved (2*rad_t+1)*n_off1 slice;
        # everything else packs behind (outer-oy rows first, then the
        # inner-oy/outer-ox remainder).  pbits only ever holds non-INF
        # data in the inner block, so it shrinks to n_ii rows (+1 scratch
        # row that absorbs the outer-oy group's always-INF writes).
        n_in1 = 2 * rad_t + 1
        oy0 = rad - rad_t
        n_ii = n_in1 * n_in1
        n_out_x = n_off1 - n_in1
        base_b = n_ii + n_out_x * n_off1          # inner-oy, outer-ox rows

        def obit(oyi, oxi):
            """Packed bits row of offset (oyi, oxi); oyi traced, oxi static."""
            ir = (oyi >= oy0) & (oyi < oy0 + n_in1)
            g = jnp.where(oyi < oy0, oyi, oyi - n_in1)
            o_out = n_ii + g * n_off1 + oxi
            if abs(oxi - rad) <= rad_t:
                o_in = (oyi - oy0) * n_in1 + (oxi - oy0)
            else:
                r_ox = oxi - n_in1 if oxi > rad + rad_t else oxi
                o_in = base_b + (oyi - oy0) * n_out_x + r_ox
            return jnp.where(ir, o_in, o_out)

        def opbit(oyi, oxi):
            """pbits row: inner-block row, or the scratch row n_ii."""
            ir = (oyi >= oy0) & (oyi < oy0 + n_in1)
            o_in = (oyi - oy0) * n_in1 + (oxi - oy0)
            return jnp.where(ir, o_in, n_ii)

        def off_candidates(oyi, oxi, ir_scalar):
            """cand mask for offset (oy, ox): bounds + temporal radius."""
            cand = cand_x_mask(oxi)
            if mode == "filter" and has_prev:
                # broadcast the scalar bool through i32 — Mosaic cannot
                # lower a direct scalar-i1 -> vector-i1 broadcast
                ir_vec = (
                    jnp.zeros((1, c4p), jnp.int32)
                    + ir_scalar.astype(jnp.int32)
                ) > 0
                cand = cand & (ir_vec | jnp.logical_not(prev_p))
            return cand

        def off_geom(oyi, oxi):
            ox = oxi - rad
            cidx = ox + j_base * step
            return cidx % step, cidx // step - j_base       # phase, lane delta

        def inner_base(oyi):
            """bits row of the FIRST inner-ox offset at row oyi.

            The inner-ox offsets (|ox - rad| <= rad_t) are CONTIGUOUS in
            the packed layout for every oyi (see obit), so phases A/C/E
            batch their bits traffic and mask algebra as ONE
            (n_in1, C4p) tensor op instead of n_in1 row ops."""
            ir = (oyi >= oy0) & (oyi < oy0 + n_in1)
            g = jnp.where(oyi < oy0, oyi, oyi - n_in1)
            return jnp.where(
                ir, (oyi - oy0) * n_in1, n_ii + g * n_off1 + (rad - rad_t)
            )

        def inner_bits(oyi):
            """(n_in1, C4p) bits rows of the inner-ox group.  The rows are
            contiguous at inner_base(oyi), but a dynamic multi-row vector
            load needs a provably 8-aligned offset (Mosaic), so load
            per-row and concatenate in registers."""
            ib = inner_base(oyi)
            return jnp.concatenate(
                [bits_s[pl.ds(ib + i, 1)] for i in range(n_in1)], axis=0)

        # ---- phase A: distances -> masked int32 bits ----
        # INF-prefill: the inner block always; the packed outer rows only
        # when some site needs the spatial fallback (they are only read
        # by the _full bisection, which runs on not_all_temp rows)
        if "A" not in skip:
            bits_s[pl.ds(0, n_ii)] = jnp.full((n_ii, c4p), _INF_BITS, jnp.int32)
            if n_off > n_ii:
                @pl.when(not_all_temp)
                def _():
                    bits_s[pl.ds(n_ii, n_off - n_ii)] = jnp.full(
                        (n_off - n_ii, c4p), _INF_BITS, jnp.int32)
            if has_prev:
                pbits_s[:] = jnp.full((n_ii + 1, c4p), _INF_BITS, jnp.int32)

        # offsets split by temporal radius: per group the predicate is
        # uniform, so ONE pl.when wraps each group (21 predicated regions
        # -> 2; the per-offset bits writes are tiny)
        oxis_inner_a = [x for x in range(n_off1) if abs(x - rad) <= rad_t]
        oxis_outer_a = [x for x in range(n_off1) if abs(x - rad) > rad_t]

        blk_gate = (
            mode == "filter" and has_prev and oxis_outer_a and c4p >= 256
        )

        # hoisted inner-ox candidate masks (loop-invariant: fori_loop
        # closures lift them out of the per-oyi bodies).  candi stacks
        # cand_x_mask of the n_in1 inner offsets; the filter's temporal-
        # radius restriction (off_candidates) becomes ONE batched select.
        # (keep the select operands in i32 — Mosaic can neither bitcast
        # nor select/trunci i1 vregs; compare to bool only at the end)
        candi_i = jnp.concatenate(
            [cand_x_mask(oxi).astype(jnp.int32) for oxi in oxis_inner_a],
            axis=0,
        )                                                   # (n_in1, C4p)
        if mode == "filter" and has_prev:
            candi_np_i = jnp.where(prev_p, 0, candi_i)
        else:
            candi_np_i = candi_i

        def inner_cand(ir):
            """Batched off_candidates for the inner-ox group (ir is the
            group-uniform inner-oy scalar)."""
            if mode == "filter" and has_prev:
                ir_vec = (
                    jnp.zeros((1, c4p), jnp.int32) + ir.astype(jnp.int32)
                ) > 0
                return jnp.where(ir_vec, candi_i, candi_np_i) > 0
            return candi_i > 0

        def inner_wv(oyi):
            """Batched warped-prev patch-validity rows for the inner-ox
            offsets (n_in1 cheap 1-row rolls)."""
            rows = [
                _roll(
                    band_d[bslot(oyi), off_geom(oyi, oxi)[0], f : f + 1, :],
                    -off_geom(oyi, oxi)[1], interpret,
                ).astype(f32)
                for oxi in oxis_inner_a
            ]
            return jnp.concatenate(rows, axis=0) > 0.5      # (n_in1, C4p)

        # static oy split (filter+has_prev): at OUTER-oy rows every
        # candidate is spatial-only (cand subsets ~prev_p), so the
        # temporal-stats/pbits sections are strict zeros and the inner-ox
        # work matters only on the few 128-lane blocks holding a spatial
        # own site.  The oy loop splits into three static ranges — the
        # outer ranges run an all-ox per-block spatial-only body instead
        # of the full-width inner group that computed zeros on ~99% of
        # lanes every row (the frame-edge columns make not_all_temp fire
        # on EVERY row of real content).
        split_oy = mode == "filter" and has_prev and rad_t < rad

        def make_phase_a(ir_static):
            def phase_a(oyi, carry):
                qy = step * sr + (oyi - rad)
                row_ok = (qy >= qy_lo) & (qy < qy_hi)
                ir_oy = (
                    jnp.abs(oyi - rad) <= rad_t
                    if ir_static is None else jnp.asarray(ir_static)
                )

                def group(oxis, ir, bsl=None, outer=False, pre=None):
                    # block mode: the (F, 128) distance arithmetic runs
                    # on one vreg block; the 1-row bits stores RMW the
                    # full row (Mosaic cannot store at a dynamic row +
                    # lane offset).  outer offsets: prevc = cand & wv &
                    # prev_p == 0 exactly (cand subsets ~prev_p), so
                    # pbits stays INF — skip it.
                    def row_rmw(ref, o, val):
                        if bsl is None:
                            ref[pl.ds(o, 1)] = val
                            return
                        old = ref[pl.ds(o, 1)]
                        bi = bsl.start // 128
                        parts = [
                            val if k == bi else old[:, k * 128:(k + 1) * 128]
                            for k in range(c4p // 128)
                        ]
                        ref[pl.ds(o, 1)] = jnp.concatenate(parts, axis=1)

                    for oxi in oxis:
                        p, delta = off_geom(oyi, oxi)
                        if pre is not None:
                            a = pre[oxi]
                        else:
                            a = _roll(band_x[bslot(oyi), p], -delta,
                                      interpret).astype(f32)
                        cand = off_candidates(oyi, oxi, ir)
                        o = obit(oyi, oxi)
                        if bsl is not None:
                            a = a[:, bsl]
                            cand = cand[:, bsl]
                        d = a - (xp if bsl is None else xp[:, bsl])
                        dist = jnp.sum(d * d, axis=0, keepdims=True) * inv_f
                        b = jnp.where(
                            cand,
                            jax.lax.bitcast_convert_type(dist, jnp.int32),
                            inf_b,
                        )
                        row_rmw(bits_s, o, b)
                        if has_prev and not outer:
                            wv = _roll(
                                band_d[bslot(oyi), p, f : f + 1, :], -delta,
                                interpret
                            ).astype(f32) > 0.5
                            prevc = cand & (
                                (wv & prev_p) if bsl is None
                                else (wv[:, bsl] & prev_p[:, bsl])
                            )
                            row_rmw(pbits_s, opbit(oyi, oxi),
                                    jnp.where(prevc, b, inf_b))

                if ir_static is False:
                    if "P" in skip:
                        return carry
                    # outer-oy row: ALL offsets are spatial-only; run the
                    # whole ox range per firing block (full-width rolls
                    # shared), nothing full-width, no pbits
                    @pl.when(row_ok & not_all_temp)
                    def _():
                        all_ox = list(range(n_off1))
                        if c4p >= 256:
                            pre = {
                                oxi: _roll(
                                    band_x[bslot(oyi),
                                           off_geom(oyi, oxi)[0]],
                                    -off_geom(oyi, oxi)[1], interpret,
                                ).astype(f32)
                                for oxi in all_ox
                            }
                            for bi in range(c4p // 128):
                                @pl.when(blk_need[bi])
                                def _(bi=bi):
                                    group(all_ox, jnp.asarray(False),
                                          bsl=slice(bi * 128,
                                                    (bi + 1) * 128),
                                          outer=True, pre=pre)
                        else:
                            group(all_ox, jnp.asarray(False), outer=True)
                    return carry

                pred = row_ok if ir_static else (
                    row_ok & (not_all_temp | ir_oy))

                @pl.when(pred)
                def _():
                    # batched inner-ox group: distances per offset (the
                    # real work), then ONE masked bitcast/select; the
                    # bits rows are CONTIGUOUS (inner_base) but Mosaic
                    # only proves sublane alignment for single-row
                    # dynamic stores, so the store is per-row (VMEM
                    # traffic is identical)
                    rows = []
                    for oxi in oxis_inner_a:
                        p, delta = off_geom(oyi, oxi)
                        a = _roll(band_x[bslot(oyi), p], -delta,
                                  interpret).astype(f32)
                        d = a - xp
                        rows.append(
                            jnp.sum(d * d, axis=0, keepdims=True) * inv_f)
                    dist = jnp.concatenate(rows, axis=0)    # (n_in1, C4p)
                    cand = inner_cand(ir_oy)
                    b = jnp.where(
                        cand, jax.lax.bitcast_convert_type(dist, jnp.int32),
                        inf_b)
                    ib = inner_base(oyi)
                    for i in range(n_in1):
                        bits_s[pl.ds(ib + i, 1)] = b[i : i + 1]
                    if has_prev:
                        # prevc == 0 exactly for outer-oy rows (cand
                        # subsets ~prev_p there): only inner-oy rows
                        # store pbits
                        prevc = cand & inner_wv(oyi) & prev_p
                        pb = jnp.where(prevc, b, inf_b)

                        def store_pb():
                            pbase = (oyi - oy0) * n_in1
                            for i in range(n_in1):
                                pbits_s[pl.ds(pbase + i, 1)] = pb[i : i + 1]

                        if ir_static:
                            store_pb()
                        else:
                            pl.when(ir_oy)(store_pb)

                if "P" in skip:
                    pass
                elif oxis_outer_a and not blk_gate:
                    @pl.when(row_ok & not_all_temp)
                    def _():
                        group(oxis_outer_a, jnp.asarray(False), outer=True)
                elif oxis_outer_a:
                    # the full-width band rolls are shared across the
                    # firing blocks (each block's group used to re-roll
                    # all outer offsets); only the (F, 128) arithmetic
                    # runs per block
                    @pl.when(row_ok & not_all_temp)
                    def _():
                        pre = {
                            oxi: _roll(
                                band_x[bslot(oyi), off_geom(oyi, oxi)[0]],
                                -off_geom(oyi, oxi)[1], interpret,
                            ).astype(f32)
                            for oxi in oxis_outer_a
                        }
                        for bi in range(c4p // 128):
                            @pl.when(blk_need[bi])
                            def _(bi=bi):
                                group(oxis_outer_a, jnp.asarray(False),
                                      bsl=slice(bi * 128, (bi + 1) * 128),
                                      outer=True, pre=pre)
                return carry

            return phase_a

        if "A" not in skip:
            if split_oy:
                jax.lax.fori_loop(0, oy0, make_phase_a(False), 0)
                jax.lax.fori_loop(oy0, oy0 + n_in1, make_phase_a(True), 0)
                jax.lax.fori_loop(oy0 + n_in1, n_off1, make_phase_a(False), 0)
            else:
                jax.lax.fori_loop(0, n_off1, make_phase_a(None), 0)

        # ---- phase B: k-th smallest thresholds by bit bisection ----
        if has_prev:
            k1 = jnp.where(prev_p, np_t, np_x).astype(jnp.int32)
        else:
            k1 = jnp.full((1, c4p), np_x, jnp.int32)
        k_agg = jnp.full((1, c4p), nagg, jnp.int32)

        def bisect(b, k):
            zero = jnp.zeros((1, c4p), jnp.int32)

            def body(_, lh):
                lo, hi = lh
                mid = lo + (hi - lo) // 2
                cnt = jnp.sum((b <= mid).astype(jnp.int32), axis=0,
                              keepdims=True)
                ok = cnt >= k
                return jnp.where(ok, lo, mid + 1), jnp.where(ok, mid, hi)

            lo, hi = jax.lax.fori_loop(0, 31, body, (zero, zero + inf_b))
            return jnp.where(k <= 0, -1, hi)

        if "B" in skip:
            inf_row = jnp.full((1, c4p), inf_b, jnp.int32)
            th1 = tha = thp = inf_row
        elif mode == "filter" and has_prev and rad_t < rad:
            # all-temporal rows only have live bits in the packed inner
            # block (the (2*rad_t+1)^2 leading rows); pbits' live rows are
            # ALWAYS that block (row n_ii is the INF scratch row)
            def _inner():
                bi = bits_s[pl.ds(0, n_ii)]
                pbi = pbits_s[pl.ds(0, n_ii)]
                return bisect(bi, k1), bisect(bi, k_agg), bisect(pbi, k_agg)

            def _full():
                ba = bits_s[:]
                pba = pbits_s[pl.ds(0, n_ii)]
                return bisect(ba, k1), bisect(ba, k_agg), bisect(pba, k_agg)

            th1, tha, thp = jax.lax.cond(all_temp, _inner, _full)
        else:
            ba = bits_s[:]
            th1 = bisect(ba, k1)
            tha = bisect(ba, k_agg)
            thp = bisect(pbits_s[pl.ds(0, n_ii)], k_agg) if has_prev else tha

        # ---- phase C: masked group statistics ----
        acc_m1c[:] = jnp.zeros_like(acc_m1c)
        acc_e2[:] = jnp.zeros_like(acc_e2)
        if has_prev:
            acc_m0v[:] = jnp.zeros_like(acc_m0v)
            acc_e0[:] = jnp.zeros_like(acc_e0)
            acc_v01[:] = jnp.zeros_like(acc_v01)
            acc_m0[:] = jnp.zeros_like(acc_m0)
        nrows_s[:] = jnp.zeros_like(nrows_s)

        # oxi offsets split by temporal radius: within each group the
        # per-offset predicate run_pred(oyi, oxi, row_ok) is UNIFORM, so
        # one pl.when wraps the whole group and the statistics accumulate
        # across the unrolled oxi loop in VALUES — one VMEM
        # read-modify-write per accumulator per group instead of per
        # offset (the acc planes are (F, C4p); at 21 offsets/row the RMW
        # traffic dominated the phase)
        oxis_inner = [x for x in range(n_off1) if abs(x - rad) <= rad_t]
        oxis_outer = [x for x in range(n_off1) if abs(x - rad) > rad_t]

        def phase_c(oyi, carry, ir_static=None):
            qy = step * sr + (oyi - rad)
            row_ok = (qy >= qy_lo) & (qy < qy_hi)
            ir_oy = (
                jnp.abs(oyi - rad) <= rad_t
                if ir_static is None else jnp.asarray(ir_static)
            )

            def group(oxis, ir, bsl=None, outer=False, pre=None):
                # outer (spatial-fallback) offsets admit candidates only
                # on ~prev_p lanes, so spc = sel1 & wv & prev_p == 0
                # EXACTLY: the temporal statistics section contributes
                # strict zeros there and is skipped statically
                temp_stats = has_prev and not outer
                wdim = 128 if bsl is not None else c4p
                l_m1c = jnp.zeros((f, wdim), f32)
                l_e2 = jnp.zeros((f, wdim), f32)
                l_np1 = jnp.zeros((1, wdim), f32)
                if temp_stats:
                    l_m0v = jnp.zeros((f, wdim), f32)
                    l_e0 = jnp.zeros((f, wdim), f32)
                    l_v01 = jnp.zeros((f, wdim), f32)
                    l_m0 = jnp.zeros((f, wdim), f32)
                    l_np0 = jnp.zeros((1, wdim), f32)
                xp_b = xp if bsl is None else xp[:, bsl]
                prev_b = prev_p if bsl is None else prev_p[:, bsl]
                for oxi in oxis:
                    p, delta = off_geom(oyi, oxi)
                    o = obit(oyi, oxi)
                    b = bits_s[pl.ds(o, 1)]
                    cand = off_candidates(oyi, oxi, ir)
                    if pre is not None:
                        a = pre[oxi]
                    else:
                        a = _roll(band_x[bslot(oyi), p], -delta,
                                  interpret).astype(f32)
                    if bsl is not None:
                        b = b[:, bsl]
                        cand = cand[:, bsl]
                        a = a[:, bsl]
                    sel1 = cand & (b <= (th1 if bsl is None else th1[:, bsl]))
                    s1f = sel1.astype(f32)
                    # product-reuse (FMA) forms: s1f/spf/m0m are exact 0/1
                    # masks, so (s1f*wc)*wc == s1f*(wc*wc) bit-identically
                    # while trading 2 full-plane ops per accumulator pair
                    wc = a - xp_b
                    t1 = s1f * wc
                    l_m1c += t1
                    l_e2 += t1 * wc
                    l_np1 += s1f
                    if temp_stats:
                        dall = _roll(band_d[bslot(oyi), p], -delta, interpret).astype(f32)
                        if bsl is not None:
                            dall = dall[:, bsl]
                        wv = dall[f : f + 1, :] > 0.5
                        dq = dall[:f]
                        spc = sel1 & wv & prev_b
                        spf = spc.astype(f32)
                        wdc = dq - xp_b
                        t0 = spf * wdc
                        l_m0v += t0
                        l_e0 += t0 * wdc
                        dxw = dq - a
                        l_v01 += (spf * dxw) * dxw
                        m0m = (spc & (b <= (thp if bsl is None
                                            else thp[:, bsl]))).astype(f32)
                        l_m0 += m0m * dq
                        l_np0 += spf
                if bsl is None:
                    sl = slice(None)
                else:
                    sl = pl.ds(bsl.start, 128)
                acc_m1c[:, sl] += l_m1c
                acc_e2[:, sl] += l_e2
                nrows_s[0:1, sl] += l_np1
                if temp_stats:
                    acc_m0v[:, sl] += l_m0v
                    acc_e0[:, sl] += l_e0
                    acc_v01[:, sl] += l_v01
                    acc_m0[:, sl] += l_m0
                    nrows_s[1:2, sl] += l_np0

            if ir_static is False:
                if "P" in skip:
                    return carry
                # outer-oy row: ALL offsets are spatial-only — the
                # temporal stats are strict zeros and m1c/e2/np1 matter
                # only on blocks with a spatial own site; run the whole
                # ox range per firing block (full-width rolls shared)
                @pl.when(row_ok & not_all_temp)
                def _():
                    all_ox = list(range(n_off1))
                    if c4p >= 256:
                        pre = {
                            oxi: _roll(
                                band_x[bslot(oyi), off_geom(oyi, oxi)[0]],
                                -off_geom(oyi, oxi)[1], interpret,
                            ).astype(f32)
                            for oxi in all_ox
                        }
                        for bi in range(c4p // 128):
                            @pl.when(blk_need[bi])
                            def _(bi=bi):
                                group(all_ox, jnp.asarray(False),
                                      bsl=slice(bi * 128, (bi + 1) * 128),
                                      outer=True, pre=pre)
                    else:
                        group(all_ox, jnp.asarray(False), outer=True)
                return carry

            pred_c = row_ok if ir_static else (
                row_ok & (not_all_temp | ir_oy))

            @pl.when(pred_c)
            def _():
                # batched inner-ox group: ONE contiguous bits read + ONE
                # threshold compare + batched mask algebra; the per-
                # offset (F, C4p) FMA chains (the flops) are unchanged
                bmat = inner_bits(oyi)
                cand = inner_cand(ir_oy)
                sel1 = cand & (bmat <= th1)
                s1f = sel1.astype(f32)
                if has_prev:
                    wvb = inner_wv(oyi)
                    spc = sel1 & wvb & prev_p
                    spf = spc.astype(f32)
                    m0mb = (spc & (bmat <= thp)).astype(f32)
                # spatial-side stats (m1c/e2/np1) feed phase D only on
                # SPATIAL-mode lanes (temporal lanes select a_t/M0/np0),
                # so with blk_need available they run per 128-lane block
                # on the handful of blocks holding a spatial own site —
                # the frame-edge/occlusion blocks — not full width on
                # every row.  Per-lane accumulation order is unchanged,
                # so firing blocks are bit-identical to the full-width
                # path.
                spat_blk = (mode == "filter" and has_prev and c4p >= 256)
                if not spat_blk:
                    l_m1c = jnp.zeros((f, c4p), f32)
                    l_e2 = jnp.zeros((f, c4p), f32)
                if has_prev:
                    l_m0v = jnp.zeros((f, c4p), f32)
                    l_e0 = jnp.zeros((f, c4p), f32)
                    l_v01 = jnp.zeros((f, c4p), f32)
                    l_m0 = jnp.zeros((f, c4p), f32)
                rolled = []
                for i, oxi in enumerate(oxis_inner):
                    p, delta = off_geom(oyi, oxi)
                    a = _roll(band_x[bslot(oyi), p], -delta,
                              interpret).astype(f32)
                    if spat_blk:
                        rolled.append(a)
                    else:
                        wc = a - xp
                        t1 = s1f[i : i + 1] * wc
                        l_m1c += t1
                        l_e2 += t1 * wc
                    if has_prev:
                        dall = _roll(band_d[bslot(oyi), p], -delta,
                                     interpret).astype(f32)
                        dq = dall[:f]
                        wdc = dq - xp
                        t0 = spf[i : i + 1] * wdc
                        l_m0v += t0
                        l_e0 += t0 * wdc
                        dxw = dq - a
                        l_v01 += (spf[i : i + 1] * dxw) * dxw
                        l_m0 += m0mb[i : i + 1] * dq
                if spat_blk:
                    for bi in range(c4p // 128):
                        @pl.when(blk_need[bi])
                        def _(bi=bi):
                            bsl = slice(bi * 128, (bi + 1) * 128)
                            xpb = xp[:, bsl]
                            lm = jnp.zeros((f, 128), f32)
                            le = jnp.zeros((f, 128), f32)
                            for i2 in range(len(oxis_inner)):
                                wc = rolled[i2][:, bsl] - xpb
                                t1 = s1f[i2 : i2 + 1, bsl] * wc
                                lm += t1
                                le += t1 * wc
                            sl = pl.ds(bi * 128, 128)
                            acc_m1c[:, sl] += lm
                            acc_e2[:, sl] += le
                            nrows_s[0:1, sl] += jnp.sum(
                                s1f[:, bsl], axis=0, keepdims=True)
                else:
                    acc_m1c[:] += l_m1c
                    acc_e2[:] += l_e2
                    nrows_s[0:1] += jnp.sum(s1f, axis=0, keepdims=True)
                if has_prev:
                    acc_m0v[:] += l_m0v
                    acc_e0[:] += l_e0
                    acc_v01[:] += l_v01
                    acc_m0[:] += l_m0
                    nrows_s[1:2] += jnp.sum(spf, axis=0, keepdims=True)

            if "P" in skip:
                pass
            elif oxis_outer and not blk_gate:
                @pl.when(row_ok & not_all_temp)
                def _():
                    group(oxis_outer, jnp.asarray(False), outer=True)
            elif oxis_outer:
                # band rolls shared across firing blocks (see phase A)
                @pl.when(row_ok & not_all_temp)
                def _():
                    pre = {
                        oxi: _roll(
                            band_x[bslot(oyi), off_geom(oyi, oxi)[0]],
                            -off_geom(oyi, oxi)[1], interpret,
                        ).astype(f32)
                        for oxi in oxis_outer
                    }
                    for bi in range(c4p // 128):
                        @pl.when(blk_need[bi])
                        def _(bi=bi):
                            group(oxis_outer, jnp.asarray(False),
                                  bsl=slice(bi * 128, (bi + 1) * 128),
                                  outer=True, pre=pre)
            return carry

        if "C" not in skip:
            if split_oy:
                jax.lax.fori_loop(
                    0, oy0, lambda i, c: phase_c(i, c, False), 0)
                jax.lax.fori_loop(
                    oy0, oy0 + n_in1, lambda i, c: phase_c(i, c, True), 0)
                jax.lax.fori_loop(
                    oy0 + n_in1, n_off1, lambda i, c: phase_c(i, c, False), 0)
            else:
                jax.lax.fori_loop(0, n_off1, phase_c, 0)

        # ---- phase D: Kalman/Wiener update -> per-site specs ----
        np1 = nrows_s[0:1]
        np0 = nrows_s[1:2] if has_prev else jnp.zeros((1, c4p), f32)
        np1s = jnp.maximum(np1, 1.0)
        np0s = jnp.maximum(np0, 1.0)

        m1c = acc_m1c[:] / np1s
        e2 = acc_e2[:] / np1s
        v1 = jnp.maximum(e2 - m1c * m1c, 0.0)
        m1_mean = m1c + xp

        if has_prev:
            m0vc = acc_m0v[:] / np0s
            v0 = jnp.maximum(acc_e0[:] / np0s - m0vc * m0vc, 0.0)
            v01 = acc_v01[:] / np0s
            m0 = acc_m0[:] / jnp.minimum(np0s, nagg * 1.0)
        else:
            v0 = v01 = m0 = jnp.zeros_like(v1)

        temporal = np0 > 0.0                                  # (1, C4p)

        if mode == "filter":
            v_t = v0 + jnp.maximum(0.0, v01 - sub)
            a_t = v_t / (v_t + beta_t * sigma2)
            vp_t = jnp.sum(
                (1.0 - a_t * a_t) * v_t + a_t * a_t * sigma2,
                axis=0, keepdims=True,
            )
            v_x = jnp.maximum(0.0, v1 - sub)
            a_x = v_x / (v_x + beta_x * sigma2)
            vp_x = jnp.sum(a_x * v_x, axis=0, keepdims=True)
            a = jnp.where(temporal, a_t, a_x)
            m_ref = jnp.where(temporal, m0, m1_mean)
            nagg_eff = jnp.minimum(
                jnp.where(np0 > 0, np0, np1), nagg * 1.0
            )
            vp = jnp.where(temporal, vp_t, vp_x) * nagg_eff
            wgt = 1.0 / jnp.maximum(vp, 1e-6)
            gspec = a
            bias = (1.0 - a) * m_ref
            gdspec = None
        else:
            b_t = beta_t
            denom = v1 + b_t * v01
            a = jnp.where(denom > 0.0, v1 / jnp.maximum(denom, 1e-30), 0.0)
            vp = jnp.sum(
                (1.0 - a * a) * v1
                + a * a * jnp.maximum(v0 - b_t * v01, 0.0),
                axis=0, keepdims=True,
            ) * jnp.minimum(np0, nagg * 1.0)
            wgt = 1.0 / jnp.maximum(vp, 1e-6)
            pass_m = (np0 == 0.0) & site_m
            gspec = jnp.where(pass_m, 1.0, 1.0 - a)
            bias = jnp.zeros_like(a)
            gdspec = jnp.where(pass_m, 0.0, a)
            pass_w = pass_m.astype(f32) * 1e6

        ones_row = jnp.ones((1, c4p), f32)
        parts = [bias, ones_row]                              # (F+1, C4p)
        if fw_pad > f + 1:
            parts.append(jnp.zeros((fw_pad - f - 1, c4p), f32))
        bwspec = jnp.concatenate(parts, axis=0)               # (fw_pad, C4p)

        # ---- phase E: aggregate member weights into the plane buffer ----
        # Same inner/outer grouping as phase C (uniform predicate per
        # group); contributions accumulate in VALUES per target phase p
        # (a Python int — off_geom of a static oxi), so each (slot, p)
        # plane takes ONE read-modify-write per group instead of one per
        # offset.  The old per-offset jnp.max(memw) > 0 skip is dropped:
        # with sites across the whole row in lanes, an offset almost
        # always has at least one member lane, so the guard never paid.
        #
        # Roll factorization: roll(memw * gspec, d) == roll(memw, d) *
        # roll(gspec, d) exactly (lane rotation is a permutation), and
        # gspec/bwspec/gdspec are CONSTANT across offsets while delta
        # takes only a handful of static values — so the full-plane rolls
        # are hoisted out of the offset loop (one (1, C4p) memw roll per
        # offset remains)
        inner_deltas = sorted({off_geom(0, oxi)[1] for oxi in oxis_inner})
        rg_d = {d: _roll(gspec, d, interpret) for d in inner_deltas}
        rbw_d = {d: _roll(bwspec, d, interpret) for d in inner_deltas}
        if smooth:
            rgd_d = {d: _roll(gdspec, d, interpret) for d in inner_deltas}
        # outer offsets take the dense (value-accumulating) path when the
        # sparsity assumption fails — has_prev=False (first frame: every
        # lane is spatial-mode, every offset has members on every row) or
        # narrow c4p — so hoist their plane rolls too in that case
        outer_dense = bool(oxis_outer) and not blk_gate
        if outer_dense:
            for d in sorted({off_geom(0, oxi)[1] for oxi in oxis_outer}):
                if d not in rg_d:
                    rg_d[d] = _roll(gspec, d, interpret)
                    rbw_d[d] = _roll(bwspec, d, interpret)

        wgt_own = wgt * own_f32

        def phase_e(oyi, carry, ir_static=None):
            qy = step * sr + (oyi - rad)
            row_ok = (qy >= qy_lo) & (qy < qy_hi)
            slot = jnp.mod(step * sr + oyi, ah)
            ir_oy = (
                jnp.abs(oyi - rad) <= rad_t
                if ir_static is None else jnp.asarray(ir_static)
            )

            if ir_static is False:
                if "P" in skip:
                    return carry
                # outer-oy row: members exist only on the rare
                # spatial-mode lanes for EVERY offset (inner-ox included:
                # cand subsets ~prev_p here, so mem == memsp) — run the
                # whole ox range through the member-gated sparse path
                # instead of the full-width batched FMAs
                @pl.when(row_ok & not_all_temp)
                def _():
                    for oxi in range(n_off1):
                        p, delta = off_geom(oyi, oxi)
                        o = obit(oyi, oxi)
                        b = bits_s[pl.ds(o, 1)]
                        cand = off_candidates(oyi, oxi, jnp.asarray(False))
                        sel1 = cand & (b <= th1)
                        memw = (sel1 & (b <= tha)).astype(f32) * wgt_own

                        @pl.when(jnp.sum(memw) > 0.0)
                        def _(p=p, delta=delta, memw=memw):
                            agg_g[slot, p] += _roll(
                                memw * gspec, delta, interpret)
                            agg_bw[slot, p] += _roll(
                                memw * bwspec, delta, interpret)
                return carry

            pred_e = row_ok if ir_static else (
                row_ok & (not_all_temp | ir_oy))

            @pl.when(pred_e)
            def _():
                # batched inner-ox group: ONE bits read + batched member
                # mask algebra; per offset only the (1, C4p) weight-row
                # roll and the gain/bias plane FMAs remain
                bmat = inner_bits(oyi)
                cand = inner_cand(ir_oy)
                sel1 = cand & (bmat <= th1)
                if has_prev:
                    prevc = sel1 & inner_wv(oyi) & prev_p
                    m0sel_f = (prevc & (bmat <= thp)).astype(f32)
                # select the member mask in f32 — Mosaic cannot lower a
                # select between i1 vectors
                if mode == "filter":
                    memsp_f = (sel1 & (bmat <= tha)).astype(f32)
                    if has_prev:
                        mem_f = jnp.where(temporal, m0sel_f, memsp_f)
                    else:
                        mem_f = memsp_f
                else:
                    mem_f = (
                        m0sel_f if has_prev
                        else jnp.zeros((n_in1, c4p), f32)
                    )
                memw_b = mem_f * wgt_own
                l_g, l_bw, l_gd = {}, {}, {}
                for i, oxi in enumerate(oxis_inner):
                    p, delta = off_geom(oyi, oxi)
                    memw = memw_b[i : i + 1]
                    if smooth and oxi == rad:
                        center_f = (oyi == rad).astype(f32)
                        memw = memw + pass_w * center_f * own_f32
                    mwr = _roll(memw, delta, interpret)
                    l_g[p] = l_g.get(p, 0.0) + mwr * rg_d[delta]
                    l_bw[p] = l_bw.get(p, 0.0) + mwr * rbw_d[delta]
                    if smooth:
                        l_gd[p] = l_gd.get(p, 0.0) + mwr * rgd_d[delta]
                for p in sorted(l_g):
                    agg_g[slot, p] += l_g[p]
                    agg_bw[slot, p] += l_bw[p]
                    if smooth:
                        agg_gd[slot, p] += l_gd[p]

            if "P" in skip:
                pass
            elif outer_dense:
                # dense case (has_prev=False or narrow c4p): every offset
                # has members on every firing row, so per-offset gating
                # and unhoisted full-plane rolls would pay maximal cost —
                # accumulate into VALUES per target phase with the
                # hoisted rg_d/rbw_d rolls, one agg RMW per (slot, p)
                @pl.when(row_ok & not_all_temp)
                def _():
                    l_g, l_bw = {}, {}
                    for oxi in oxis_outer:
                        p, delta = off_geom(oyi, oxi)
                        o = obit(oyi, oxi)
                        b = bits_s[pl.ds(o, 1)]
                        cand = off_candidates(oyi, oxi, jnp.asarray(False))
                        sel1 = cand & (b <= th1)
                        memw = (sel1 & (b <= tha)).astype(f32) * wgt_own
                        mwr = _roll(memw, delta, interpret)
                        l_g[p] = l_g.get(p, 0.0) + mwr * rg_d[delta]
                        l_bw[p] = l_bw.get(p, 0.0) + mwr * rbw_d[delta]
                    for p in sorted(l_g):
                        agg_g[slot, p] += l_g[p]
                        agg_bw[slot, p] += l_bw[p]
            elif oxis_outer:
                # sparse case: outer offsets carry members only on the
                # rare spatial-mode lanes (cand & ~prev_p zeroes them
                # elsewhere, so mem == memsp); most outer offsets have
                # NO member in this row — gate each offset on its member
                # count and RMW the agg planes directly
                @pl.when(row_ok & not_all_temp)
                def _():
                    for oxi in oxis_outer:
                        p, delta = off_geom(oyi, oxi)
                        o = obit(oyi, oxi)
                        b = bits_s[pl.ds(o, 1)]
                        cand = off_candidates(oyi, oxi, jnp.asarray(False))
                        sel1 = cand & (b <= th1)
                        memw = (sel1 & (b <= tha)).astype(f32) * wgt * own_f32

                        @pl.when(jnp.sum(memw) > 0.0)
                        def _(p=p, delta=delta, memw=memw):
                            agg_g[slot, p] += _roll(
                                memw * gspec, delta, interpret)
                            agg_bw[slot, p] += _roll(
                                memw * bwspec, delta, interpret)
            return carry

        if "E" not in skip:
            if split_oy:
                jax.lax.fori_loop(
                    0, oy0, lambda i, c: phase_e(i, c, False), 0)
                jax.lax.fori_loop(
                    oy0, oy0 + n_in1, lambda i, c: phase_e(i, c, True), 0)
                jax.lax.fori_loop(
                    oy0 + n_in1, n_off1, lambda i, c: phase_e(i, c, False), 0)
            else:
                jax.lax.fori_loop(0, n_off1, phase_e, 0)

    # ---- in-kernel finalization of retired patch rows ----------------
    # Patch rows [step*sr - rad, +step) have received every contribution
    # (slot = (patch_row + rad) mod AH, as in phase E).  They are band
    # rows [0, step), so fd = gain (.) nd + bias (+ gain_d (.) dd) comes
    # straight from VMEM; inverse DCT as a psz^2 x psz^2 matmul on the
    # MXU (basis rows permuted dx-major so the window fold processes all
    # psz dy-rows of one dx column as a single (psz, C4p) slab); the
    # separable-window overlap-add lands in a LINEAR rolling pixel
    # accumulator (local row = pixel_row - (step*sr - rad)) that shifts
    # by `step` rows per step after retiring rows [0, step).
    bk_t = bk_ref[:]                           # (dx*psz+dy, freq), permuted
    wy = win_ref[:, 0:1]                       # (psz, 1) window column
    wx1 = _window_1d("gaussian", psz)          # python floats for dx scale

    for i2 in range(step) if "G" not in skip else ():
        slot_i = jnp.mod(step * sr + i2, ah)
        for p in range(step):
            gain = agg_g[slot_i, p]                           # (F, C4p)
            bw = agg_bw[slot_i, p]                            # (fw_pad, C4p)
            ndr = (band_n if has_basic else band_x)[bslot(i2), p].astype(f32)
            fd = gain * ndr + bw[:f]
            if smooth and has_prev:
                fd = fd + agg_gd[slot_i, p] * band_d[bslot(i2), p, :f, :].astype(f32)
            wrow = bw[f : f + 1]                              # (1, C4p)
            pix_ch = [
                jnp.dot(bk_t, fd[c * psz2 : (c + 1) * psz2],
                        preferred_element_type=f32)           # (psz2, C4p)
                for c in range(ch)
            ]
            wy_row = wy * wrow                                # (psz, C4p)
            for dx in range(psz):
                tp = (p + dx) % step
                d2 = (p + dx) // step
                wxv = float(wx1[dx])
                for c in range(ch):
                    slab = pix_ch[c][dx * psz : (dx + 1) * psz]
                    pix_acc[pl.ds(i2, psz), tp, c] += _roll(
                        (wxv * wy) * slab, d2, interpret
                    )
                pix_acc[pl.ds(i2, psz), tp, ch] += _roll(
                    wxv * wy_row, d2, interpret
                )
        agg_g[slot_i] = jnp.zeros_like(agg_g[slot_i])
        agg_bw[slot_i] = jnp.zeros_like(agg_bw[slot_i])
        if smooth:
            agg_gd[slot_i] = jnp.zeros_like(agg_gd[slot_i])

    # ---- retire finished pixel rows [step*sr - rad, +step), shift ----
    opix_ref[:] = pix_acc[0:step]
    rest = pix_acc[step:ph]
    pix_acc[0 : ph - step] = rest
    pix_acc[ph - step : ph] = jnp.zeros_like(pix_acc[ph - step : ph])


def pallas_pass_supported(
    h: int, w: int, ch: int, prms: NLKParams, mode: str,
    budget_bytes: int = 100 * 1024 * 1024,
    window_dtype: str = "float32",
) -> bool:
    """True when the fused kernel's VMEM plan fits the budget."""
    band_elem = 2 if window_dtype == "bfloat16" else 4
    psz = prms.patch_sz
    if psz % 2 or psz < 2:
        return False
    if prms.dista_lambda != 1.0 or prms.dista_th > 0.0:
        return False          # LAMBDA_DISTANCE / dista_th live in v2 only
    step = psz // 2
    f = ch * psz * psz
    rad = max(prms.search_sz_x, prms.search_sz_t) if mode == "filter" \
        else prms.search_sz_t
    if rad < 1 or w - psz + 1 < 1 or h - psz + 1 < 1:
        return False
    if ch + 1 > 8:
        return False          # raw bands carry pixel channels + validity
    ww = w - psz + 1
    ns = (ww - 1) // step + 1
    pad_l = _cdiv(rad, step) * step
    c4 = _cdiv(pad_l + max(step * (ns - 1) + rad + psz, w), step)
    c4p = max(_cdiv(c4, 128) * 128, 128)
    bh = 2 * rad + step
    bh_c = _cdiv(bh, step) * step
    n_off = (2 * rad + 1) ** 2
    rad_t_p = prms.search_sz_t
    n_off_p = n_off + (2 * rad_t_p + 1) ** 2 + 1   # bits + packed pbits
    n_acc = 3 if mode == "smooth" else 2
    sub_t = 16 if window_dtype == "bfloat16" else 8
    fd_pad = _cdiv(f + 1, sub_t) * sub_t
    # worst case: x + d + n DCT bands, all circular (bh_c rows)
    bands = bh_c * step * (2 * f + fd_pad) * c4p * band_elem
    nrr = step + psz - 1
    raw = 3 * nrr * step * 8 * c4p * 4 + 8 * (psz * _nshift(psz) * step) * c4p * 4
    bits = n_off_p * c4p * 4
    agg = (2 * rad + step) * step * (n_acc * f + 1) * c4p * 4
    outs = 2 * step * step * (n_acc * f + 1) * c4p * 4 * 2  # double-buffered
    accs = 8 * f * c4p * 4
    return bands + raw + bits + agg + outs + accs < budget_bytes


@functools.partial(
    jax.jit,
    static_argnames=(
        "sigma", "prms", "mode", "has_prev", "has_basic", "return_accum",
        "window_dtype", "interpret", "stage", "site_rows", "site_lanes",
    ),
)
def dense_pass_pallas(
    cur: jnp.ndarray,
    prev: jnp.ndarray,
    prev_valid: jnp.ndarray,
    basic: jnp.ndarray,
    sigma: float,
    prms: NLKParams,
    mode: str,
    has_prev: bool,
    has_basic: bool,
    return_accum: bool = False,
    window_dtype: str = "float32",
    interpret: bool = False,
    stage: str = "all",   # "prep" | "kernel" | "all" — profiling cut points
    site_rows: tuple | None = None,   # static (start, stop) local site rows
    qy_bounds: jnp.ndarray | None = None,  # (2,) valid local patch-row range
    dyn: dict | None = None,          # TRACED scalar overrides (training)
    site_lanes: tuple | None = None,  # static (start, stop) own site lanes
):
    """Drop-in equivalent of engine.dense_pass_v2 built on the fused kernel."""
    if prms.dista_lambda != 1.0 or prms.dista_th > 0.0:
        raise ValueError(
            "dista_lambda != 1 / dista_th > 0 are v2-engine variants "
            "(LAMBDA_DISTANCE / non-K threshold selection); use engine='v2'"
        )
    h, w, ch = cur.shape
    psz = prms.patch_sz
    step = psz // 2
    f = ch * psz * psz
    hh, ww = h - psz + 1, w - psz + 1

    if mode == "filter":
        rad = max(prms.search_sz_x, prms.search_sz_t)
    else:
        rad = prms.search_sz_t
    rad_t = prms.search_sz_t
    n_off1 = 2 * rad + 1

    ns = (ww - 1) // step + 1
    n_rows = (hh - 1) // step + 1
    pad_l = _cdiv(rad, step) * step
    j_base = pad_l // step
    # lanes must cover the candidate span (incl. the psz raw columns each
    # candidate patch reads), the folded pixel span, and the image
    c4 = _cdiv(pad_l + max(step * (ns - 1) + rad + psz, w), step)
    c4p = max(_cdiv(c4, 128) * 128, 128)
    bh = 2 * rad + step
    bh_c = _cdiv(bh, step) * step             # circular band rows
    ah = 2 * rad + step
    ph = 4 * step   # rolling pixel rows (live span is step + psz - 1 < 3*step)
    # run until every PIXEL row (0 .. h-1) has been retired
    n_steps = _cdiv(h + rad - step, step) + 1
    n_steps = max(n_steps, n_rows)
    nrr = step + psz - 1                      # raw rows per band fill
    r_raw = step * (n_steps - 1) + bh_c + psz - 1

    wdt = jnp.bfloat16 if window_dtype == "bfloat16" else jnp.float32
    # channel (sublane) dims must be tile multiples — a 65-channel bf16
    # band (F + validity) faults the DMA/layout on real hardware
    sub_t = 16 if wdt == jnp.bfloat16 else 8
    fd_pad = _cdiv(f + 1, sub_t) * sub_t      # d band: F + validity
    fw_pad = _cdiv(f + 1, 8) * 8              # f32 bias+weight field
    psz2 = psz * psz
    blk = psz2 + max(fd_pad - f, 8)           # basis rows per phase block

    # ---- raw phase-split pixel bands (the patch DCT itself runs
    # IN-KERNEL as MXU matmuls — the reference's MATPROD intent,
    # src/nlkalman.c:135,190-191 — so only ~KB of raw rows stream per
    # grid step instead of the multi-MB DCT-image band) ----
    chp = 8

    def prep_raw(img, valid=None):
        planes = [img]
        if valid is not None:
            planes.append(valid.astype(img.dtype)[..., None])
        a = planes[0] if len(planes) == 1 else jnp.concatenate(planes, -1)
        cc = a.shape[-1]
        a = jnp.pad(
            a,
            [(rad, r_raw - rad - h), (pad_l, step * c4p - pad_l - w),
             (0, chp - cc)],
        )
        a = a.reshape(r_raw, c4p, step, chp).transpose(0, 2, 3, 1)
        return a.astype(jnp.float32)

    qyb = (
        jnp.asarray([0, hh], jnp.int32) if qy_bounds is None
        else qy_bounds.astype(jnp.int32)
    )
    x_img = basic if has_basic else cur
    ins = [qyb]
    if dyn is not None:
        ins.append(jnp.stack([
            jnp.asarray(dyn["np_t"], jnp.float32),
            jnp.asarray(dyn["np_x"], jnp.float32),
            jnp.asarray(dyn["nagg"], jnp.float32),
            jnp.asarray(dyn["beta_x"], jnp.float32),
            jnp.asarray(dyn["beta_t"], jnp.float32),
            jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
        ]))
    ins.append(prep_raw(x_img))
    if has_prev:
        ins.append(prep_raw(prev, prev_valid))
    if has_basic:
        ins.append(prep_raw(cur))

    n_scalar_ins = 1 + (1 if dyn is not None else 0)
    if stage == "prep":
        return tuple(ins[n_scalar_ins:])

    ins.append(jnp.asarray(_inkernel_dct_basis_np(psz, blk)))
    # inverse-DCT basis with pixel rows permuted dx-major (row dx*psz+dy)
    bk_t = _ortho_basis_kron_np(psz).T
    perm = np.arange(psz2).reshape(psz, psz).T.reshape(-1)  # dy*psz+dx -> dx-major
    ins.append(jnp.asarray(bk_t[perm], jnp.float32))
    w1 = _window_1d("gaussian", psz)
    win = np.zeros((psz, 128), np.float32)
    win[:, 0] = w1
    ins.append(jnp.asarray(win))

    smooth = mode == "smooth"
    ch_pad = _cdiv(ch + 1, 8) * 8           # pixel channels + weight field
    out_shapes = [
        jax.ShapeDtypeStruct((n_steps * step, step, ch_pad, c4p), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec(
            (step, step, ch_pad, c4p), lambda s: (s, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ]

    n_off = n_off1 * n_off1
    tap = psz * _nshift(psz) * step
    scratch = [pltpu.VMEM((bh_c, step, f, c4p), wdt)]
    if has_prev:
        scratch.append(pltpu.VMEM((bh_c, step, fd_pad, c4p), wdt))
    if has_basic:
        scratch.append(pltpu.VMEM((bh_c, step, f, c4p), wdt))
    n_raw = 1 + int(has_prev) + int(has_basic)
    scratch += [pltpu.VMEM((nrr, step, chp, c4p), jnp.float32)] * n_raw
    scratch.append(pltpu.VMEM((chp, tap, c4p), jnp.float32))  # DCT elements
    scratch.append(pltpu.VMEM((n_off, c4p), jnp.int32))
    if has_prev:
        # pbits holds non-INF rows only for the packed inner block
        # (+1 scratch row absorbing the outer-oy groups' INF writes)
        scratch.append(pltpu.VMEM(((2 * rad_t + 1) ** 2 + 1, c4p), jnp.int32))
    n_acc_scr = 6 if has_prev else 2
    scratch += [pltpu.VMEM((f, c4p), jnp.float32)] * n_acc_scr
    scratch.append(pltpu.VMEM((8, c4p), jnp.float32))         # np1/np0 rows
    scratch.append(pltpu.VMEM((ah, step, f, c4p), jnp.float32))
    scratch.append(pltpu.VMEM((ah, step, fw_pad, c4p), jnp.float32))
    if smooth:
        scratch.append(pltpu.VMEM((ah, step, f, c4p), jnp.float32))
    scratch.append(pltpu.VMEM((ph, step, ch_pad, c4p), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((3,)))

    cfg = dict(
        step=step, f=f, rad=rad, rad_t=rad_t, n_off1=n_off1, hh=hh, ww=ww,
        ns=ns, j_base=j_base, c4p=c4p, bh=bh, ah=ah, n_rows=n_rows,
        n_steps=n_steps, mode=mode, has_prev=has_prev, has_basic=has_basic,
        np_t=prms.npatches_t, np_x=prms.npatches_x, nagg=prms.npatches_tagg,
        sigma2=sigma * sigma, beta_x=prms.beta_x, beta_t=prms.beta_t,
        sub=0.0 if has_basic else sigma * sigma, interpret=interpret,
        fw_pad=fw_pad, ch=ch, ph=ph, ch_pad=ch_pad,
        bh_c=bh_c, nrr=nrr, blk=blk,
        sr_lo=0 if site_rows is None else site_rows[0],
        sr_hi=n_rows if site_rows is None else min(site_rows[1], n_rows),
        dyn=dyn is not None,
        j_own=(0, ns) if site_lanes is None else site_lanes,
        # debug-only phase peeling (see _fused_pass_kernel).  Read at
        # trace time: changing the env var does NOT invalidate already-
        # jitted callers — use one process per setting (tools/
        # profile_pass_phases.py does)
        skip=tuple(sorted(filter(None, os.environ.get(
            "BNLK_KERNEL_SKIP", "").split(",")))),
    )

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * n_scalar_ins
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * (
        len(ins) - n_scalar_ins - 3
    )
    in_specs.append(
        pl.BlockSpec((step * blk, tap), lambda s: (0, 0),
                     memory_space=pltpu.VMEM)
    )
    in_specs.append(
        pl.BlockSpec((psz2, psz2), lambda s: (0, 0), memory_space=pltpu.VMEM)
    )
    in_specs.append(
        pl.BlockSpec((psz, 128), lambda s: (0, 0), memory_space=pltpu.VMEM)
    )
    outs = pl.pallas_call(
        functools.partial(_fused_pass_kernel, cfg=cfg),
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*ins)

    if stage == "kernel":
        return outs

    # unphase the retired pixel rows: flat row = pixel_row + rad,
    # col = step*lane + phase = padded col (pad_l-shifted)
    o = outs[0]                       # (n_steps*step, step, ch_pad, C4p)
    t = o.transpose(0, 3, 1, 2).reshape(o.shape[0], c4p * step, ch_pad)
    t = t[rad : rad + h, pad_l : pad_l + w]
    out = t[..., :ch]
    agg = t[..., ch]

    if return_accum:
        return out, agg

    # normalize; uncovered pixels copy the input [src/nlkalman.c:940-942]
    covered = agg > 1e-6
    return jnp.where(
        covered[..., None], out / jnp.maximum(agg, 1e-6)[..., None], cur
    )


def strips_supported(h: int, w: int, ch: int, prms: NLKParams, mode: str,
                     n_strips: int,
                     budget_bytes: int = 100 * 1024 * 1024,
                     window_dtype: str = "float32") -> bool:
    """True when the fused kernel fits VMEM on width-w/n_strips column
    strips (plus halos)."""
    psz = prms.patch_sz
    if psz % 2 or psz < 2 or n_strips < 2:
        return False
    step = psz // 2
    rad = max(prms.search_sz_x, prms.search_sz_t) if mode == "filter" \
        else prms.search_sz_t
    ww = w - psz + 1
    if ww < 1 or h - psz + 1 < 1:
        return False
    ns = (ww - 1) // step + 1
    halo_px = _cdiv(rad, step) * step
    j1 = _cdiv(ns, n_strips)
    strip_w = min(w, step * (j1 - 1) + psz + 2 * halo_px)
    return pallas_pass_supported(h, strip_w, ch, prms, mode, budget_bytes,
                                 window_dtype)


def dense_pass_pallas_xstrips(
    cur, prev, prev_valid, basic, sigma, prms, mode, has_prev, has_basic,
    n_strips: int = 2,
    return_accum: bool = False,
    window_dtype: str = "float32",
    interpret: bool = False,
    dyn: dict | None = None,
    bounds: list | None = None,
):
    """The fused pass over column strips with halo overlap-add.

    When the full-width VMEM plan exceeds the budget (1080p RGB), the
    frame is split into ``n_strips`` column strips; each strip is a
    normal fused-kernel pass whose sub-image carries a ``rad``-aligned
    pixel halo (the candidate support of its own sites), with
    aggregation restricted to OWN site lanes (site_lanes) — the strips'
    pre-normalization accumulators then overlap-add exactly like the
    row-sharded path's halo fold.

    ``bounds`` (site-column indices, len n+1) overrides the even split —
    dense_pass_pallas_edgesplit uses [0, e, ns-e, ns].
    """
    h, w, ch = cur.shape
    psz = prms.patch_sz
    step = psz // 2
    rad = max(prms.search_sz_x, prms.search_sz_t) if mode == "filter" \
        else prms.search_sz_t
    ww = w - psz + 1
    ns = (ww - 1) // step + 1
    halo_px = _cdiv(rad, step) * step
    if bounds is None:
        bounds = [round(i * ns / n_strips) for i in range(n_strips + 1)]
    n_strips = len(bounds) - 1

    out_acc = jnp.zeros((h, w, ch), jnp.float32)
    agg_acc = jnp.zeros((h, w), jnp.float32)
    for i in range(n_strips):
        j0, j1 = bounds[i], bounds[i + 1]
        px0 = max(0, step * j0 - halo_px)
        px1 = min(w, step * (j1 - 1) + psz + halo_px)
        sl = (slice(None), slice(px0, px1))
        o, a = dense_pass_pallas(
            cur[sl], prev[sl], prev_valid[sl], basic[sl], sigma, prms,
            mode, has_prev, has_basic, return_accum=True,
            window_dtype=window_dtype, interpret=interpret, dyn=dyn,
            site_lanes=(j0 - px0 // step, j1 - px0 // step),
        )
        out_acc = out_acc.at[:, px0:px1].add(o)
        agg_acc = agg_acc.at[:, px0:px1].add(a)

    if return_accum:
        return out_acc, agg_acc
    covered = agg_acc > 1e-6
    return jnp.where(
        covered[..., None],
        out_acc / jnp.maximum(agg_acc, 1e-6)[..., None], cur,
    )


def dense_pass_pallas_edgesplit(
    cur, prev, prev_valid, basic, sigma, prms, mode, has_prev, has_basic,
    edge_sites: int = 2,
    return_accum: bool = False,
    window_dtype: str = "float32",
    interpret: bool = False,
    dyn: dict | None = None,
):
    """Edge-hybrid ownership split of the fused filter pass.

    The frame-border site columns always lack a valid temporal patch
    (the reference's NaN-footprint bicubic warp invalidates a ~2 px
    border band, src/nlkalman.c:29-34,71-88), which forces the
    spatial-fallback machinery — full-width band pre-rolls for all 441
    window offsets — to fire on EVERY row of the full-width pass:
    measured 41 ms vs 17 ms with the fallback disabled (1080p gray).

    Split OWNERSHIP instead of width: a full-width middle pass owns the
    interior site columns (its rows are then genuinely all-temporal on
    temporally-covered content and take the predicated fast path), and
    two narrow edge strips (~24 px + halo) own the border sites and run
    the full spatial machinery at ~1/4-vreg width.  Contributions
    overlap-add pre-normalization exactly like dense_pass_pallas_xstrips
    (site_lanes ownership), so the result is the single-pass result.
    Interior occlusion blobs are still handled by the middle pass's
    per-block predicates at their usual cost.
    """
    h, w, ch = cur.shape
    psz = prms.patch_sz
    step = psz // 2
    ww = w - psz + 1
    ns = (ww - 1) // step + 1
    e = edge_sites
    if ns <= 4 * e:  # tiny frames: the split buys nothing
        return dense_pass_pallas(
            cur, prev, prev_valid, basic, sigma, prms, mode, has_prev,
            has_basic, return_accum=return_accum,
            window_dtype=window_dtype, interpret=interpret, dyn=dyn)
    return dense_pass_pallas_xstrips(
        cur, prev, prev_valid, basic, sigma, prms, mode, has_prev,
        has_basic, return_accum=return_accum, window_dtype=window_dtype,
        interpret=interpret, dyn=dyn, bounds=[0, e, ns - e, ns])

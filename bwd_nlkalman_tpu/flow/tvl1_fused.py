"""Whole-level fused TV-L1 solver: ONE Pallas kernel per pyramid level.

Round-2 profiling showed the per-level cost of the TV-L1 solve is
dominated by fixed per-launch/per-op overheads, not compute: a 9x15
coarse level took ~10 ms (dozens of kernel launches: 5 warp stages x
several iteration blocks x consts-building XLA glue), and at the finest
fscale=1 level (540x960) the warp + consts glue alone was ~9 ms of the
44 ms level.  This module fuses the ENTIRE single-scale solve of
Dual_TVL1_optic_flow (lib/tvl1flow/tvl1flow_lib.c:93-275) — all nwarps
warp stages, each with its in-kernel bicubic warp, threshold step,
divergence/gradient updates and the reference's convergence test — into
one Pallas kernel with the whole level state resident in VMEM:

- the warp is the gather-free shift-select bicubic (ops/warp_pallas.py
  design) run in 8-row blocks inside the kernel: per-block dynamic
  roll ranges mean the select cost scales with the LOCAL flow range;
- the primal-dual iterations are full-plane VPU passes (no tiles, no
  halo recompute, no HBM traffic at all during the solve);
- the stopping rule (mean squared update < epsilon^2, capped at
  MAX_ITERATIONS; tvl1flow_lib.c:165,24) is evaluated every
  ``k_check`` iterations by an in-kernel lax.while_loop.

Dispatch: used for levels whose VMEM plan fits (~<=540x960 f32);
larger levels fall back to the tiled iteration-block kernel
(tvl1_pallas.py), and non-TPU backends to the XLA path (tvl1.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRAD_IS_ZERO = 1e-10  # tvl1flow_lib.c:26
_G = 4                # warp pad width (ops/warp_pallas.py)


def _cubic(v0, v1, v2, v3, x):
    return v1 + 0.5 * x * (
        v2 - v0 + x * (2.0 * v0 - 5.0 * v1 + 4.0 * v2 - v3
                       + x * (3.0 * (v1 - v2) + v3 - v0))
    )


def _sroll(x, sh, interpret):
    """Lane roll left by a static amount."""
    if sh == 0:
        return x
    if interpret:
        return jnp.roll(x, -sh, axis=-1)
    return pltpu.roll(x, (-sh) % x.shape[-1], axis=len(x.shape) - 1)


def _droll(x, sh, interpret):
    """Lane roll left by a traced non-negative amount."""
    if interpret:
        return jnp.roll(x, -sh, axis=-1)
    return pltpu.roll(x, (-sh) % x.shape[-1], axis=len(x.shape) - 1)


def _level_kernel(
    i0_ref, i1p_ref, u_ref, mi_ref, lam_ref, uout_ref,
    us, ps, cs, hwin,
    *, h, w, hp, ln, nwarps, tau, theta, epsilon,
    k_check, sdt, interpret,
):
    f32 = jnp.float32
    i32 = jnp.int32
    taut = tau / theta
    # TRACED scalars (SMEM): the iteration cap and the data weight
    # lambda — the two knobs the reference's tuning scripts sweep
    # (2d-search-filtering-oflow.sh DW; MAX_ITERATIONS tvl1flow_lib.c:24)
    # — retune without recompiling the Mosaic kernel
    max_iters = mi_ref[0]
    l_t = lam_ref[0] * theta

    us[:] = u_ref[:]
    # dual planes, STACKED by difference direction so the iteration
    # operates on (2, hp, ln) component pairs: ps[0:2] = (p11, p21)
    # (x-differences of u1/u2), ps[2:4] = (p12, p22) (y-differences)
    ps[:] = jnp.zeros((4, hp, ln), sdt)

    gy = jax.lax.broadcasted_iota(i32, (hp, ln), 0)
    gx = jax.lax.broadcasted_iota(i32, (hp, ln), 1)
    # forward-gradient masks are widened to the PAD region (>= instead of
    # ==): then the dual planes stay identically zero at col >= w-1 /
    # row >= h-1 (p init 0, update (0 + taut*0)*r = 0), and the
    # divergence needs NO boundary selects at all — the cyclic rolls
    # bring in exact zeros, so ax[0] = pa[0] - 0 and ax[w-1] = 0 -
    # pa[w-2] reproduce mask.c:152-177 bit-identically
    last_row = gy >= h - 1
    last_col = gx >= w - 1
    inframe = (gy < h) & (gx < w)
    # 0/1 multiply masks instead of selects: the iteration runs on
    # stacked (2, hp, ln) component pairs and a multiply broadcasts over
    # the leading axis where an i1-select would not lower
    mcol = jnp.where(last_col, 0.0, 1.0)[None]          # (1, hp, ln)
    mrow = jnp.where(last_row, 0.0, 1.0)[None]
    minf = jnp.where(inframe, 1.0, 0.0)[None]

    # rolls on the stacked (2, hp, ln) planes: axis 1 = rows (sublanes),
    # axis 2 = lanes; the leading component axis is pure addressing
    def shift_down(x):
        return pltpu.roll(x, 1, 1) if not interpret else jnp.roll(x, 1, 1)

    def shift_up(x):
        return (pltpu.roll(x, hp - 1, 1) if not interpret
                else jnp.roll(x, -1, 1))

    def shift_right(x):
        return pltpu.roll(x, 1, 2) if not interpret else jnp.roll(x, 1, 2)

    def shift_left(x):
        return (pltpu.roll(x, ln - 1, 2) if not interpret
                else jnp.roll(x, -1, 2))

    # ---------------- in-kernel shift-select bicubic warp ----------------
    def do_warp():
        """Warp (i1, i1x, i1y) along the current (u1s, u2s) into cs as
        {i1wx, i1wy, grad, rho_c} (tvl1flow_lib.c:145-160)."""
        nblk = hp // 8

        def blk_body(b, carry):
            r0 = b * 8
            u1b = us[0, pl.ds(r0, 8), :].astype(f32)
            u2b = us[1, pl.ds(r0, 8), :].astype(f32)
            lane = jax.lax.broadcasted_iota(i32, (8, ln), 1)
            rowi = jax.lax.broadcasted_iota(i32, (8, ln), 0) + r0
            inb32 = jnp.where((rowi < h) & (lane < w), 1.0, 0.0)
            lane_f = lane.astype(f32)
            row_f = rowi.astype(f32)
            # pad pixels take IDENTITY coords so they never widen the
            # data-dependent select ranges
            cx = lane_f + inb32 * u1b
            cy = row_f + inb32 * u2b
            fx = cx - jnp.floor(cx)
            fy = cy - jnp.floor(cy)
            bx = jnp.floor(cx).astype(i32) - 1
            by = jnp.floor(cy).astype(i32) - 1
            valid = ((bx >= 0) & (bx + 3 <= w - 1)
                     & (by >= 0) & (by + 3 <= h - 1))
            bxp = jnp.clip(bx + _G, 0, ln - 4)
            dxo = bxp - lane
            byp = jnp.clip(by, -_G, h) + _G
            lo_d = jnp.min(dxo)
            hi_d = jnp.max(dxo)
            lo_b = jnp.min(byp)
            hi_b = jnp.max(byp)

            outs = []
            for c in range(3):
                def build_h(bb, slot):
                    row2 = i1p_ref[c, pl.ds(bb, 1), :]      # (1, LN)

                    def dbody(d, accs):
                        m = jnp.where(dxo == d, 1.0, 0.0)
                        r0d = _droll(row2, d, interpret)
                        return tuple(
                            accs[l] + m * _sroll(r0d, l, interpret)
                            for l in range(4)
                        )

                    accs = tuple(jnp.zeros((8, ln), f32) for _ in range(4))
                    accs = jax.lax.fori_loop(lo_d, hi_d + 1, dbody, accs)
                    for l in range(4):
                        hwin[l, slot] = accs[l]

                for j in range(3):
                    build_h(lo_b + j, jnp.mod(lo_b + j, 4))

                def vbody(bb, val16):
                    build_h(bb + 3, jnp.mod(bb + 3, 4))
                    m = jnp.where(byp == bb, 1.0, 0.0)
                    out = []
                    for k in range(4):
                        slot = jnp.mod(bb + k, 4)
                        for l in range(4):
                            out.append(val16[k * 4 + l] + m * hwin[l, slot])
                    return tuple(out)

                val16 = tuple(jnp.zeros((8, ln), f32) for _ in range(16))
                val16 = jax.lax.fori_loop(lo_b, hi_b + 1, vbody, val16)
                cols = [
                    _cubic(val16[0 + l], val16[4 + l], val16[8 + l],
                           val16[12 + l], fy)
                    for l in range(4)
                ]
                res = _cubic(cols[0], cols[1], cols[2], cols[3], fx)
                # border_out=true: zero wherever the footprint left the
                # frame (bicubic_interpolation.c:242-264)
                outs.append(jnp.where(valid, res, 0.0))

            i1w, i1wx, i1wy = outs
            i0b = i0_ref[pl.ds(r0, 8), :]
            grad = i1wx * i1wx + i1wy * i1wy
            # store the GUARDED NEGATIVE RECIPROCAL of |grad I1w|^2: the
            # iteration's three-branch threshold step collapses to
            # fi = clip(rho * nig, -l_t, l_t) (exact: at the branch
            # boundaries rho = -+l_t*grad the clamp and the C branches
            # coincide), killing the per-iteration divide/compares/selects
            cs[0, pl.ds(r0, 8)] = i1wx
            cs[1, pl.ds(r0, 8)] = i1wy
            cs[2, pl.ds(r0, 8)] = jnp.where(
                grad < GRAD_IS_ZERO, 0.0, -1.0 / jnp.maximum(grad, GRAD_IS_ZERO)
            )
            cs[3, pl.ds(r0, 8)] = i1w - i1wx * u1b - i1wy * u2b - i0b
            return carry

        jax.lax.fori_loop(0, nblk, blk_body, 0)

    # ---------------- primal-dual iteration ----------------
    # Only the DUAL planes p are stored in ``sdt`` (bf16 trims the
    # VMEM traffic that bounds the fine-level iterations ~1.2x): p
    # feeds u only through theta*div(p), so its quantization (~ulp
    # 0.004 at |p|<=1) perturbs the flow by ~1e-3 px.  u must stay f32
    # (rho = rho_c + gx*u amplifies u's ulp by image-scale gradients)
    # and rho_c carries image-scale values, so the warp constants stay
    # f32 too.  All arithmetic runs in f32.
    #
    # STACKED form: the u1/u2 chains are identical elementwise programs,
    # so they run as ONE (2, hp, ln) op stream (U; PA = (p11, p21) the
    # x-difference duals; PB = (p12, p22) the y-difference duals).  The
    # measured streaming rate of a serial chain of full-plane ops is
    # ~half the ILP rate (tools/vpu_probe.py fma1 vs fma8) — halving the
    # op count at double width recovers most of that gap.  Per-element
    # arithmetic and order are unchanged vs the unstacked form.
    def one_iter(U, PA, PB, IG, nig, rho_c):
        U, PA, PB, IG, nig, rho_c = (
            x.astype(f32) for x in (U, PA, PB, IG, nig, rho_c))
        t = IG * U
        rho = rho_c + t[0] + t[1]
        # clamp form of the TV-L1 threshold step (tvl1flow_lib.c:195-217):
        # nig = -1/grad precomputed per warp stage; deviation only where
        # grad < GRAD_IS_ZERO and rho != 0 (there |i1wx| < 1e-5 so the C
        # branch value l_t*i1wx < 5e-7 ~ the clamp's 0)
        fi = jnp.clip(rho * nig, -l_t, l_t)[None]
        V = U + fi * IG

        # PA is 0 at cols >= w-1 and PB is 0 at rows >= h-1 (the widened
        # fgrad masks keep them so), hence the backward differences with
        # cyclic rolls are exact at both borders
        DIV = (PA - shift_right(PA)) + (PB - shift_down(PB))
        Un = V + theta * DIV

        UX = (shift_left(Un) - Un) * mcol
        UY = (shift_up(Un) - Un) * mrow
        G = jnp.sqrt(UX * UX + UY * UY)
        R = 1.0 / (1.0 + taut * G)
        return Un, (PA + taut * UX) * R, (PB + taut * UY) * R

    # warp stages and iterations as DEVICE loops (fori/while), not Python
    # unrolls — the unrolled kernel's Mosaic compile took minutes per
    # level shape; the rolled form compiles ~an order of magnitude faster
    # at negligible runtime cost (the loop bodies are full-plane passes)
    def warp_stage(_w, carry):
        do_warp()
        IG = cs[0:2]
        nig, rho_c = cs[2], cs[3]

        # the state planes ride the while CARRY: flushing them to the
        # named scratches once per ROUND added plane copies per k_check
        # iterations; now they flush once per warp stage (only do_warp's
        # row slices need u in a scratch ref)
        def cond(c):
            return (c[0] > epsilon * epsilon) & (c[1] < max_iters)

        def body(c):
            _, n, U, PA, PB = c

            def iter_body(_j, st):
                Un, PAn, PBn = one_iter(*st, IG, nig, rho_c)
                return Un, PAn.astype(sdt), PBn.astype(sdt)

            U, PA, PB = jax.lax.fori_loop(
                0, k_check - 1, iter_body, (U, PA, PB)
            )
            Up = U
            U, PA, PB = one_iter(U, PA, PB, IG, nig, rho_c)
            dU = (U - Up) * minf
            err = jnp.sum(dU * dU) / (h * w)
            return (err, n + k_check, U, PA.astype(sdt), PB.astype(sdt))

        out = jax.lax.while_loop(
            cond, body,
            (jnp.asarray(jnp.inf, f32), jnp.asarray(0, i32),
             us[:], ps[0:2], ps[2:4]),
        )
        us[:] = out[2]
        ps[0:2] = out[3]
        ps[2:4] = out[4]
        return carry

    jax.lax.fori_loop(0, nwarps, warp_stage, 0)

    uout_ref[:] = us[:]


def _plan(h: int, w: int) -> tuple[int, int, int]:
    hp = max(-(-h // 8) * 8, 8)
    ln = max(-(-(w + 2 * _G + 3) // 128) * 128, 128)
    # planes: u1,u2,p(4),consts(4) scratch + in/out (i0 + 3*i1p + u 2 + uout 2)
    vmem = (10 + 1 + 2 + 2) * hp * ln * 4 + 3 * (hp + 11) * ln * 4
    return hp, ln, vmem


def fused_level_supported(h: int, w: int,
                          budget: int = 90 * 1024 * 1024) -> bool:
    return _plan(h, w)[2] < budget


@functools.partial(
    jax.jit,
    static_argnames=("tau", "theta", "nwarps", "epsilon",
                     "k_check", "state_dtype", "interpret"),
)
def tvl1_single_scale_fused(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    u_init: jnp.ndarray,
    tau: float = 0.25,
    lambda_: float = 0.15,
    theta: float = 0.3,
    nwarps: int = 5,
    epsilon: float = 0.01,
    k_check: int = 8,
    max_iters: int | jnp.ndarray = 300,
    state_dtype: str = "float32",
    interpret: bool = False,
):
    """Drop-in single-scale TV-L1 solve, whole level in one kernel.

    i0, i1: (H, W) float32; u_init: (H, W, 2).  Returns (H, W, 2).
    ``max_iters`` and ``lambda_`` are TRACED (python scalar or scalar
    array): retuning the cap or the data weight does not recompile the
    Mosaic kernel.
    """
    from ..ops.grad import centered_gradient

    h, w = i0.shape
    hp, ln, _ = _plan(h, w)

    i1x, i1y = centered_gradient(i1)
    i1s = jnp.stack([i1, i1x, i1y], axis=0)            # (3, H, W)
    i1p = jnp.pad(
        i1s, ((0, 0), (_G, hp + 11 - h - _G), (_G, ln - w - _G)),
        mode="edge",
    )
    i0p = jnp.pad(i0, ((0, hp - h), (0, ln - w)))
    u0 = jnp.pad(
        u_init.transpose(2, 0, 1), ((0, 0), (0, hp - h), (0, ln - w))
    ).astype(jnp.float32)

    mi = jnp.asarray(max_iters, jnp.int32).reshape((1,))
    lam = jnp.asarray(lambda_, jnp.float32).reshape((1,))
    sdt = jnp.dtype(state_dtype)
    kern = functools.partial(
        _level_kernel, h=h, w=w, hp=hp, ln=ln, nwarps=nwarps,
        tau=tau, theta=theta, epsilon=epsilon,
        k_check=k_check, sdt=sdt, interpret=interpret,
    )
    uout = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, hp, ln), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, hp, ln), jnp.float32),
            pltpu.VMEM((4, hp, ln), sdt),
            pltpu.VMEM((4, hp, ln), jnp.float32),
            pltpu.VMEM((4, 4, 8, ln), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(i0p, i1p, u0, mi, lam)

    return uout[:, :h, :w].transpose(1, 2, 0)

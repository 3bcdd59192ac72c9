"""Gather-free bicubic warp as a Pallas TPU kernel (shift-select).

XLA lowers gathers on TPU to slow scalar-driven row fetches: the 16-tap
bicubic warp of one 1080p channel costs ~63 ms (measured), and the
pipeline runs several warps per frame.  This kernel replaces the gather
with VPU shift-selects over the SOURCE IMAGE RESIDENT IN VMEM (a 1080p
3-channel frame is ~26 MB; v5e VMEM fits it whole):

- horizontal stage: for each needed source row r, the four x-taps
  H_l[x] = src[r, bx(x) + l] are built by looping the per-pixel integer
  x-offset over its actual range (data-dependent fori bounds) with
  dynamic lane rotates — work scales with the LOCAL FLOW RANGE, not the
  image size;
- vertical stage: a second shift-select over the per-pixel y-base
  accumulates the 16 taps from a rolling 4-row window of H rows;
- the bicubic weights are the reference's Catmull-Rom cubic
  (src/nlkalman.c:36, lib/tvl1flow/bicubic_interpolation.c), evaluated
  after the selects.

Tap/base semantics are shared by both reference interpolators:
base = floor(coord) - 1, taps base+{0..3}, cubic at frac(coord) — this
reproduces warp_bicubic_nan's floor-based footprint (with its -1 coord
shift pre-applied by the caller) and the flow-side truncation footprint
(see ops/warp.py docstrings).  Out-of-frame handling: the source is
padded by 4 px (zero or edge) and tap bases clamped — beyond 4 px every
tap lands on the pad, which equals the reference's per-tap Neumann clamp
for the edge mode; the returned validity mask marks pixels whose true
footprint left the frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_G = 4  # pad width; any tap base clamps into [-4, h]


def _cubic(v0, v1, v2, v3, x):
    return v1 + 0.5 * x * (
        v2 - v0 + x * (2.0 * v0 - 5.0 * v1 + 4.0 * v2 - v3
                       + x * (3.0 * (v1 - v2) + v3 - v0))
    )


def _droll(x, sh, interpret):
    """Lane roll by a (possibly traced) non-negative amount."""
    if interpret:
        return jnp.roll(x, -sh, axis=-1)
    return pltpu.roll(x, (-sh) % x.shape[-1], axis=len(x.shape) - 1)


def _warp_kernel(cx_ref, cy_ref, imp_ref, out_ref, valid_ref,
                 *, ch, h_src, w_src, ln, br, interpret):
    f32 = jnp.float32
    i32 = jnp.int32

    cx = cx_ref[:]                                    # (BR, LN) abs x coords
    cy = cy_ref[:]
    fx = cx - jnp.floor(cx)
    fy = cy - jnp.floor(cy)
    bx = jnp.floor(cx).astype(i32) - 1
    by = jnp.floor(cy).astype(i32) - 1

    valid = (
        (bx >= 0) & (bx + 3 <= w_src - 1) & (by >= 0) & (by + 3 <= h_src - 1)
    )

    lane = jax.lax.broadcasted_iota(i32, (br, ln), 1)
    # padded-lane base of the first x tap, clamped into the padded frame;
    # dxo = how far right of its own lane each pixel's first tap sits
    bxp = jnp.clip(bx + _G, 0, ln - 4)
    dxo = bxp - lane
    byp = jnp.clip(by, -_G, h_src) + _G               # padded row base

    lo_d = jnp.min(dxo)
    hi_d = jnp.max(dxo)
    lo_b = jnp.min(byp)
    hi_b = jnp.max(byp)

    def run_channel(c, hwin):
        def _sroll(x, l):
            if l == 0:
                return x
            if interpret:
                return jnp.roll(x, -l, axis=-1)
            return pltpu.roll(x, (-l) % ln, axis=1)

        def build_h(b, slot):
            """H_l rows for padded source row b -> hwin[:, slot]."""
            row2 = imp_ref[c, pl.ds(b, 1), :]         # (1, LN)

            def dbody(d, accs):
                m = (dxo == d).astype(f32)
                r0 = _droll(row2, d, interpret)
                return tuple(accs[l] + m * _sroll(r0, l) for l in range(4))

            accs = tuple(jnp.zeros((br, ln), f32) for _ in range(4))
            accs = jax.lax.fori_loop(lo_d, hi_d + 1, dbody, accs)
            for l in range(4):
                hwin[l, slot] = accs[l]

        # warm up the rolling window with rows lo_b .. lo_b+2
        for j in range(3):
            build_h(lo_b + j, jnp.mod(lo_b + j, 4))

        def vbody(b, val16):
            build_h(b + 3, jnp.mod(b + 3, 4))
            m = (byp == b).astype(f32)
            out = []
            for k in range(4):
                slot = jnp.mod(b + k, 4)
                for l in range(4):
                    out.append(val16[k * 4 + l] + m * hwin[l, slot])
            return tuple(out)

        val16 = tuple(jnp.zeros((br, ln), f32) for _ in range(16))
        val16 = jax.lax.fori_loop(lo_b, hi_b + 1, vbody, val16)

        cols = [
            _cubic(val16[0 + l], val16[4 + l], val16[8 + l], val16[12 + l], fy)
            for l in range(4)
        ]
        out_ref[c] = _cubic(cols[0], cols[1], cols[2], cols[3], fx)

    for c in range(ch):
        pl.run_scoped(
            functools.partial(run_channel, c),
            pltpu.VMEM((4, 4, br, ln), jnp.float32),
        )

    valid_ref[:] = valid.astype(f32)


@functools.partial(
    jax.jit,
    static_argnames=("pad_mode", "interpret"),
)
def bicubic_warp_pallas(
    im: jnp.ndarray,       # (H_src, W_src, C) source
    cx: jnp.ndarray,       # (H_out, W_out) absolute source-x coordinates
    cy: jnp.ndarray,       # (H_out, W_out) absolute source-y coordinates
    pad_mode: str = "zero",  # "zero" | "edge"
    interpret: bool = False,
):
    """Sample im at (cy, cx) with the reference bicubic; returns
    (out (H_out, W_out, C), valid (H_out, W_out) bool)."""
    h_src, w_src, ch = im.shape
    h_out, w_out = cx.shape
    br = 8
    hb = -(-h_out // br) * br
    ln = max(-(-(w_src + 2 * _G) // 128) * 128,
             -(-w_out // 128) * 128)

    mode = "edge" if pad_mode == "edge" else "constant"
    imp = jnp.pad(im, ((_G, _G + 3), (_G, ln - w_src - _G), (0, 0)),
                  mode=mode)
    imp = imp.transpose(2, 0, 1)                      # (C, Hp, LN)

    # out-of-grid pad rows/lanes get IDENTITY coordinates so they never
    # widen the data-dependent select ranges (a constant fill makes the
    # far pad lanes' dxo ~ -LN, exploding the select loops and tripping
    # the TPU execution watchdog)
    xg = jnp.broadcast_to(
        jnp.arange(ln, dtype=jnp.float32)[None, :], (hb, ln)
    )
    yg = jnp.broadcast_to(
        jnp.arange(hb, dtype=jnp.float32)[:, None], (hb, ln)
    )
    cxp = xg.at[:h_out, :w_out].set(cx.astype(jnp.float32))
    cyp = yg.at[:h_out, :w_out].set(cy.astype(jnp.float32))

    kern = functools.partial(
        _warp_kernel, ch=ch, h_src=h_src, w_src=w_src, ln=ln, br=br,
        interpret=interpret,
    )
    out, valid = pl.pallas_call(
        kern,
        grid=(hb // br,),
        in_specs=[
            pl.BlockSpec((br, ln), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, ln), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ch, br, ln), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, ln), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ch, hb, ln), jnp.float32),
            jax.ShapeDtypeStruct((hb, ln), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(cxp, cyp, imp)

    out = out[:, :h_out, :w_out].transpose(1, 2, 0)
    valid = valid[:h_out, :w_out] > 0.5
    return out, valid


def warp_supported(h_src: int, w_src: int, ch: int,
                   budget: int = 80 * 1024 * 1024) -> bool:
    ln = -(-(w_src + 2 * _G) // 128) * 128
    return ch * (h_src + 12) * ln * 4 + 3 * 1024 * 1024 < budget

"""Fused Pallas TPU kernel for the TV-L1 primal-dual inner iterations.

The XLA formulation (tvl1.py) runs ~30 small stencil kernels per
iteration — each a full HBM round trip (~0.4 ms/iteration at 540p).
This kernel applies temporal blocking: each row tile is loaded into VMEM
with a K-row overlap halo and K whole primal-dual iterations run on it
before anything is written back.  Information propagates one row per
iteration, so after K iterations the tile's owned rows are exactly the
Jacobi result (the overlap region is recomputed redundantly — VPU flops
are far cheaper than HBM latency).  Tiles ping-pong between two HBM
state planes across blocks so the scheme stays Jacobi like the reference
(tvl1flow_lib.c:165-245).

State: (2, 6, rows, W) float32 = ping/pong x {u1,u2,p11,p12,p21,p22},
rows = K + Hp + K (+alignment), W 128-padded.  Constants: (4, rows, W) =
{i1wx, i1wy, grad, rho_c}.  The mean-squared update of the last
iteration is accumulated into a scalar so the outer while_loop can apply
the reference's stopping rule at K-iteration granularity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRAD_IS_ZERO = 1e-10  # tvl1flow_lib.c:26
K_ITERS = 24          # iterations fused per block (halo rows = K_ITERS)


def _shift_down(x):
    """out[i] = x[i-1]; the wrapped row is always masked by the caller."""
    return pltpu.roll(x, 1, 0)


def _shift_up(x):
    return pltpu.roll(x, x.shape[0] - 1, 0)


def _shift_right(x):
    return pltpu.roll(x, 1, 1)


def _shift_left(x):
    return pltpu.roll(x, x.shape[1] - 1, 1)


def _tvl1_block_kernel(
    parity_ref, state_in, consts_ref, state_ref, err_ref, sem,
    *, tr: int, h: int, w: int, wp: int, k_iters: int, khalo: int,
    tau: float, lambda_: float, theta: float,
):
    """One grid step: k_iters fused iterations on one row tile.

    khalo = k_iters for multi-tile runs (information propagates one row
    per iteration); 0 when the tile is the whole image (the state never
    leaves VMEM within the block, so no redundant halo recompute)."""
    del state_in  # aliased with state_ref
    ty = pl.program_id(0)
    l_t = lambda_ * theta
    taut = tau / theta
    read_rows = tr + 2 * khalo + 16
    r0 = ty * tr

    src = parity_ref[0]
    dst = 1 - src

    @pl.when(ty == 0)
    def _():
        err_ref[0, 0] = 0.0

    def body(st, cn, out_buf):
        cp1 = pltpu.make_async_copy(
            state_ref.at[src, :, pl.ds(r0, read_rows), :], st, sem.at[0]
        )
        cp2 = pltpu.make_async_copy(
            consts_ref.at[:, pl.ds(r0, read_rows), :], cn, sem.at[1]
        )
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()

        u1, u2 = st[0], st[1]
        p11, p12, p21, p22 = st[2], st[3], st[4], st[5]
        i1wx, i1wy, grad, rho_c = cn[0], cn[1], cn[2], cn[3]

        # padded row r0+l corresponds to global row r0+l-(khalo+8)
        gy = jax.lax.broadcasted_iota(jnp.int32, (read_rows, wp), 0) + r0 - (khalo + 8)
        gx = jax.lax.broadcasted_iota(jnp.int32, (read_rows, wp), 1)
        first_row = gy == 0
        last_row = gy == h - 1
        first_col = gx == 0
        last_col = gx == w - 1

        def one_iter(u1, u2, p11, p12, p21, p22):
            rho = rho_c + i1wx * u1 + i1wy * u2
            fi = jnp.where(
                grad < GRAD_IS_ZERO, 0.0, -rho / jnp.maximum(grad, GRAD_IS_ZERO)
            )
            lo_m = rho < -l_t * grad
            hi_m = rho > l_t * grad
            d1 = jnp.where(lo_m, l_t * i1wx, jnp.where(hi_m, -l_t * i1wx, fi * i1wx))
            d2 = jnp.where(lo_m, l_t * i1wy, jnp.where(hi_m, -l_t * i1wy, fi * i1wy))
            v1 = u1 + d1
            v2 = u2 + d2

            def div(pa, pb):
                ax = jnp.where(
                    first_col, pa,
                    jnp.where(last_col, -_shift_right(pa), pa - _shift_right(pa)),
                )
                by = jnp.where(
                    first_row, pb,
                    jnp.where(last_row, -_shift_down(pb), pb - _shift_down(pb)),
                )
                return ax + by

            u1n = v1 + theta * div(p11, p12)
            u2n = v2 + theta * div(p21, p22)

            def fgrad(u):
                ux = jnp.where(last_col, 0.0, _shift_left(u) - u)
                uy = jnp.where(last_row, 0.0, _shift_up(u) - u)
                return ux, uy

            u1x, u1y = fgrad(u1n)
            u2x, u2y = fgrad(u2n)
            g1 = jnp.sqrt(u1x * u1x + u1y * u1y)
            g2 = jnp.sqrt(u2x * u2x + u2y * u2y)
            ng1 = 1.0 + taut * g1
            ng2 = 1.0 + taut * g2
            return (
                u1n, u2n,
                (p11 + taut * u1x) / ng1,
                (p12 + taut * u1y) / ng1,
                (p21 + taut * u2x) / ng2,
                (p22 + taut * u2y) / ng2,
            )

        u1_prev = u1
        u2_prev = u2
        for j in range(k_iters):
            if j == k_iters - 1:
                u1_prev, u2_prev = u1, u2
            u1, u2, p11, p12, p21, p22 = one_iter(u1, u2, p11, p12, p21, p22)

        # error of the last iteration, owned+valid rows only.  NB the
        # roll-based shifts wrap circularly; every wrapped element is
        # masked by the first/last row/col border rules, and the halo of
        # each tile absorbs any influence on interior rows.
        own = (gy >= r0) & (gy < jnp.minimum(r0 + tr, h)) & (gx < w) & (gy >= 0)
        du1 = jnp.where(own, u1 - u1_prev, 0.0)
        du2 = jnp.where(own, u2 - u2_prev, 0.0)
        err_ref[0, 0] += jnp.sum(du1 * du1) + jnp.sum(du2 * du2)

        # write back owned rows (padded rows [r0+khalo+8, +tr))
        o0 = khalo + 8
        out_buf[:] = jnp.stack(
            [u1[o0 : o0 + tr], u2[o0 : o0 + tr], p11[o0 : o0 + tr],
             p12[o0 : o0 + tr], p21[o0 : o0 + tr], p22[o0 : o0 + tr]], axis=0
        )
        cpo = pltpu.make_async_copy(
            out_buf, state_ref.at[dst, :, pl.ds(r0 + o0, tr), :], sem.at[2]
        )
        cpo.start()
        cpo.wait()

    pl.run_scoped(
        body,
        pltpu.VMEM((6, read_rows, wp), jnp.float32),
        pltpu.VMEM((4, read_rows, wp), jnp.float32),
        pltpu.VMEM((6, tr, wp), jnp.float32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("h", "w_real", "k_iters", "khalo", "tau", "lambda_",
                     "theta"),
)
def tvl1_iter_block(
    state: jnp.ndarray,   # (2, 6, rows, Wp) ping-pong state
    consts: jnp.ndarray,  # (4, rows, Wp)
    parity: jnp.ndarray,  # (1,) int32: source plane index
    h: int,
    w_real: int,
    k_iters: int = K_ITERS,
    khalo: int | None = None,
    tau: float = 0.25,
    lambda_: float = 0.15,
    theta: float = 0.3,
):
    """Run k_iters fused TV-L1 iterations; returns (state, err)."""
    _, _, rows, wp = state.shape
    if khalo is None:
        khalo = k_iters
    hp = rows - 2 * khalo - 16
    tr = hp if khalo == 0 else min(256, hp)
    while hp % tr:
        tr //= 2
    n_tiles = hp // tr

    kern = functools.partial(
        _tvl1_block_kernel, tr=tr, h=h, w=w_real, wp=wp, k_iters=k_iters,
        khalo=khalo, tau=tau, lambda_=lambda_, theta=theta,
    )
    state_out, err = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(state.shape, state.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((3,)),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(parity, state, consts)
    return state_out, err[0, 0] / (h * w_real)


def tvl1_single_scale_pallas(
    i0, i1, u_init,
    tau: float = 0.25, lambda_: float = 0.15, theta: float = 0.3,
    nwarps: int = 5, epsilon: float = 0.01, k_iters: int = K_ITERS,
    max_iterations: int = 300,
):
    """Drop-in replacement for tvl1_flow_single_scale with the fused
    kernel.  Stopping rule checked every k_iters iterations (running a
    few iterations past the reference's stopping point only brings the
    iterate closer to the fixed point)."""
    from ..ops.grad import centered_gradient
    from ..ops.warp import warp_bicubic_zero_multi, build_taps16

    h, w = i0.shape
    wp = -(-w // 128) * 128
    khalo = k_iters
    # larger tiles amortize the 2*khalo+16-row halo recompute (2x overhead
    # at tr=64 -> 1.25x at tr=256); VMEM at tr=256 is ~21 MB.  NB a single
    # whole-image tile compiles pathologically slowly in Mosaic — capped.
    tr = 256 if h >= 256 else (64 if h >= 64 else 8)
    hp = -(-h // tr) * tr
    pad_top = khalo + 8
    pad_bot = (hp - h) + khalo + 8
    padc = wp - w

    i1x, i1y = centered_gradient(i1)
    u1, u2 = u_init[..., 0], u_init[..., 1]
    p = jnp.zeros((4, h, w), i0.dtype)

    i1s = jnp.stack([i1, i1x, i1y], axis=-1)
    i1s_taps = build_taps16(i1s)   # flow-independent; shared by all warps
    for _ in range(nwarps):
        wrp = warp_bicubic_zero_multi(i1s, u1, u2, taps=i1s_taps)
        i1w, i1wx, i1wy = wrp[..., 0], wrp[..., 1], wrp[..., 2]
        grad = i1wx * i1wx + i1wy * i1wy
        rho_c = i1w - i1wx * u1 - i1wy * u2 - i0

        consts = jnp.pad(
            jnp.stack([i1wx, i1wy, grad, rho_c], axis=0),
            ((0, 0), (pad_top, pad_bot), (0, padc)),
        )
        st = jnp.pad(
            jnp.stack([u1, u2, p[0], p[1], p[2], p[3]], axis=0),
            ((0, 0), (pad_top, pad_bot), (0, padc)),
        )
        state = jnp.stack([st, st], axis=0)

        def cond(c):
            _, _, err, n = c
            return (err > epsilon * epsilon) & (n < max_iterations)

        def body(c):
            state, parity, _, n = c
            state, err = tvl1_iter_block(
                state, consts, parity, h=h, w_real=w, k_iters=k_iters,
                khalo=khalo, tau=tau, lambda_=lambda_, theta=theta,
            )
            return state, 1 - parity, err, n + k_iters

        state, parity, _, _ = jax.lax.while_loop(
            cond, body,
            (state, jnp.zeros((1,), jnp.int32), jnp.asarray(jnp.inf, i0.dtype), 0),
        )
        # the latest fully-updated plane is indexed by the final parity
        final = jnp.where(
            parity[0] == 1,
            state[1, :, pad_top : pad_top + h, :w],
            state[0, :, pad_top : pad_top + h, :w],
        )
        u1, u2 = final[0], final[1]
        p = final[2:6]

    return jnp.stack([u1, u2], axis=-1)

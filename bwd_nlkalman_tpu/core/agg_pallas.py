"""Pallas kernel for the phase-plane aggregation of the dense engine.

The v2 engine's aggregation is a 36-term shifted add of rank-1 products
u[o, site] * specs[site, c] into (psz/2)^2 phase planes
(core/engine.py).  XLA materializes the accumulator between adds
(~36 x 36 MB per block at 1080p), making this the most expensive stage.
Here the local accumulator lives in VMEM for the whole 36-term chain and
is folded into the global planes with one read-modify-write DMA per
x-tile (the TPU grid is sequential, so accumulation is race-free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NXT = 128  # sites per x-tile


def _agg_kernel(
    sr0_ref, u6_ref, specs_ref, g_in, g_ref, sem,
    *, step: int, n_sh: int, rb: int, nx_t: int, c_all: int, col_pad: int,
):
    del g_in  # aliased with g_ref
    tx = pl.program_id(0)
    cx0 = tx * nx_t
    sr0 = sr0_ref[0]
    pr = rb + n_sh + 1

    def body(u6, sp, loc, gbuf):
        cpu = pltpu.make_async_copy(
            u6_ref.at[:, :, :, :, :, pl.ds(cx0, nx_t)], u6, sem.at[0]
        )
        cps = pltpu.make_async_copy(
            specs_ref.at[:, pl.ds(cx0, nx_t), :], sp, sem.at[1]
        )
        cpu.start()
        cps.start()
        cpu.wait()
        cps.wait()

        loc[:] = jnp.zeros((step, step, pr, nx_t + col_pad, c_all), jnp.float32)
        spv = sp[:]                                       # (rb, nx_t, c_all)
        for sy in range(n_sh):
            for sx in range(n_sh):
                contrib = u6[sy, :, sx, :][..., None] * spv[None, None]
                loc[:, :, sy : sy + rb, sx : sx + nx_t] = (
                    loc[:, :, sy : sy + rb, sx : sx + nx_t] + contrib
                )

        # read-modify-write the global planes
        cpg = pltpu.make_async_copy(
            g_ref.at[:, :, pl.ds(sr0, pr), pl.ds(cx0, nx_t + col_pad), :],
            gbuf, sem.at[2],
        )
        cpg.start()
        cpg.wait()
        gbuf[:] = gbuf[:] + loc[:]
        cpo = pltpu.make_async_copy(
            gbuf,
            g_ref.at[:, :, pl.ds(sr0, pr), pl.ds(cx0, nx_t + col_pad), :],
            sem.at[2],
        )
        cpo.start()
        cpo.wait()

    pl.run_scoped(
        body,
        pltpu.VMEM((n_sh, step, n_sh, step, rb, nx_t), jnp.float32),
        pltpu.VMEM((rb, nx_t, c_all), jnp.float32),
        pltpu.VMEM((step, step, rb + n_sh + 1, nx_t + col_pad, c_all), jnp.float32),
        pltpu.VMEM((step, step, rb + n_sh + 1, nx_t + col_pad, c_all), jnp.float32),
    )


@functools.partial(
    jax.jit, static_argnames=("step", "n_sh", "rb", "c_all"),
)
def aggregate_block(
    g_acc: jnp.ndarray,    # (step, step, nyp, nxp_pal, c_all) global planes
    u6: jnp.ndarray,       # (n_sh, step, n_sh, step, rb, nx_pal) member weights
    specs: jnp.ndarray,    # (rb, nx_pal, c_all) per-site value channels
    sr0: jnp.ndarray,      # (1,) int32 phase-plane row base of this block
    step: int, n_sh: int, rb: int, c_all: int,
):
    nx_pal = u6.shape[-1]
    n_xt = nx_pal // NXT
    col_pad = n_sh + 1 + (8 - (n_sh + 1) % 8) % 8  # 8-aligned slice overhang

    kern = functools.partial(
        _agg_kernel, step=step, n_sh=n_sh, rb=rb, nx_t=NXT, c_all=c_all,
        col_pad=col_pad,
    )
    out = pl.pallas_call(
        kern,
        grid=(n_xt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(g_acc.shape, g_acc.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((3,))],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(sr0, u6, specs, g_acc)
    return out

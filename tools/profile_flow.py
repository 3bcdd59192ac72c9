"""Per-stage on-chip breakdown of the TV-L1 flow at 1080p fscale=1.

Separates: prologue (normalize+presmooth), zoom pyramid, per-level cost,
and inside the finest level: warp stage vs fused iteration blocks vs
state pack/unpack glue.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/bnlk_jax_cache")

import jax.numpy as jnp


def sync(o):
    if isinstance(o, (tuple, list)):
        o = o[0]
    return np.asarray(jax.device_get(o.ravel()[:1]))


def timeit(name, fn, reps=5):
    t0 = time.perf_counter()
    sync(fn())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn()
    sync(o)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:44s}: {dt:8.2f} ms  (first {compile_s:.0f}s)", flush=True)
    return dt


def main():
    from bwd_nlkalman_tpu.flow import tvl1_flow
    from bwd_nlkalman_tpu.flow.tvl1 import (
        _normalize_pair, num_scales, PRESMOOTHING_SIGMA)
    from bwd_nlkalman_tpu.flow.tvl1_pallas import (
        tvl1_single_scale_pallas, tvl1_iter_block, K_ITERS)
    from bwd_nlkalman_tpu.ops.gaussian import gaussian_blur
    from bwd_nlkalman_tpu.ops.zoom import zoom_out, zoom_in, zoom_size
    from bwd_nlkalman_tpu.ops.warp import warp_bicubic_zero_multi, build_taps16
    from bwd_nlkalman_tpu.ops.grad import centered_gradient

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    i0 = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    i1 = jnp.asarray(np.roll(np.asarray(i0), (2, -3), (0, 1)))

    flow_fn = jax.jit(lambda a, b: tvl1_flow(a, b, fscale=1))
    total = timeit("tvl1_flow 1080p fscale=1 TOTAL", lambda: flow_fn(i0, i1))

    # ---- prologue ----
    @jax.jit
    def prologue(a, b):
        an, bn = _normalize_pair(a, b)
        return gaussian_blur(an, PRESMOOTHING_SIGMA), gaussian_blur(bn, PRESMOOTHING_SIGMA)

    timeit("normalize + 2x presmooth 1080p", lambda: prologue(i0, i1))

    # ---- zoom chain ----
    ns = num_scales(w, h, 100, 0.5)
    print(f"nscales={ns} (fscale=1 -> levels {ns-1}..1 run, level 0 upscale only)")

    a, b = prologue(i0, i1)
    sizes = [(w, h)]
    pyr = [(a, b)]
    for s in range(1, ns):
        pw, ph = sizes[-1]
        sizes.append(zoom_size(pw, ph, 0.5))
        aa, bb = pyr[-1]
        pyr.append((zoom_out(aa, 0.5), zoom_out(bb, 0.5)))

    @jax.jit
    def zoomchain(a, b):
        outs = []
        for s in range(1, ns):
            a = zoom_out(a, 0.5)
            b = zoom_out(b, 0.5)
            outs.append(a)
        return outs[-1]

    timeit("zoom_out chain (all levels, both imgs)", lambda: zoomchain(a, b))

    # ---- per-level single-scale cost ----
    lvl_ms = []
    for s in range(ns - 1, 0, -1):
        aa, bb = pyr[s]
        lh, lw = aa.shape
        u0 = jnp.zeros((lh, lw, 2), jnp.float32)
        fn = jax.jit(lambda x, y, u: tvl1_single_scale_pallas(x, y, u))
        ms = timeit(f"level {s} ({lh}x{lw}) single-scale", lambda: fn(aa, bb, u0), reps=3)
        lvl_ms.append(ms)

    # ---- inside the finest executed level (540x960) ----
    aa, bb = pyr[1]
    lh, lw = aa.shape
    u1 = jnp.zeros((lh, lw), jnp.float32)
    u2 = jnp.zeros((lh, lw), jnp.float32)

    i1x, i1y = centered_gradient(bb)
    i1s = jnp.stack([bb, i1x, i1y], axis=-1)

    @jax.jit
    def warp_plus_consts(i1s, u1, u2, i0):
        taps = build_taps16(i1s)
        wrp = warp_bicubic_zero_multi(i1s, u1, u2, taps=taps)
        i1w, i1wx, i1wy = wrp[..., 0], wrp[..., 1], wrp[..., 2]
        grad = i1wx * i1wx + i1wy * i1wy
        rho_c = i1w - i1wx * u1 - i1wy * u2 - i0
        wp = -(-lw // 128) * 128
        khalo = K_ITERS
        tr = 256 if lh >= 256 else 64
        hp = -(-lh // tr) * tr
        consts = jnp.pad(
            jnp.stack([i1wx, i1wy, grad, rho_c], axis=0),
            ((0, 0), (khalo + 8, (hp - lh) + khalo + 8), (0, wp - lw)))
        return consts

    timeit(f"warp+grad+rho+pad ({lh}x{lw})", lambda: warp_plus_consts(i1s, u1, u2, aa))

    consts = warp_plus_consts(i1s, u1, u2, aa)
    wp = consts.shape[-1]
    rows = consts.shape[-2]
    state = jnp.zeros((2, 6, rows, wp), jnp.float32)
    parity = jnp.zeros((1,), jnp.int32)

    timeit(f"1x tvl1_iter_block ({K_ITERS} iters, {lh}x{lw})",
           lambda: tvl1_iter_block(state, consts, parity, h=lh, w_real=lw)[0])

    # build_taps16 cost alone
    timeit("build_taps16 (540x960x3)", lambda: jax.jit(build_taps16)(i1s))

    print(f"\nTOTAL {total:.1f} ms; levels sum {sum(lvl_ms):.1f} ms")


if __name__ == "__main__":
    main()

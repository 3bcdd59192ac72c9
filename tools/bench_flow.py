"""On-chip TV-L1 flow profile: end-to-end vs per-level solve times.

Usage: python tools/bench_flow.py [H W] (default 1080 1920, fscale=1).
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
    return np.asarray(jax.device_get(o.ravel()[:1]))


def timeit(fn, reps=5):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    from bwd_nlkalman_tpu.flow.tvl1 import (
        tvl1_flow, num_scales, _normalize_pair, zoom_size,
    )
    from bwd_nlkalman_tpu.flow.tvl1_fused import (
        tvl1_single_scale_fused, fused_level_supported,
    )
    from bwd_nlkalman_tpu.ops.gaussian import gaussian_blur
    from bwd_nlkalman_tpu.ops.zoom import zoom_out, zoom_in

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    sigma = 20.0
    rng = np.random.default_rng(0)
    base = rng.uniform(40, 215, (h + 8, w + 8)).astype(np.float32)
    i0 = base[:h, :w] + sigma * rng.standard_normal((h, w)).astype(np.float32)
    i1 = base[3:3 + h, 2:2 + w] + sigma * rng.standard_normal((h, w)).astype(np.float32)
    i0 = jnp.asarray(i0)
    i1 = jnp.asarray(i1)

    f = jax.jit(lambda a, b: tvl1_flow(a, b, fscale=1))
    t = timeit(lambda: f(i0, i1))
    print(f"tvl1_flow end-to-end {h}x{w} fscale=1: {t:.1f} ms", flush=True)

    # per-level solves with realistic inputs (pyramid of the same pair)
    ns = num_scales(w, h, 100, 0.5)
    i0n, i1n = _normalize_pair(i0, i1)
    i0n = gaussian_blur(i0n, 0.8)
    i1n = gaussian_blur(i1n, 0.8)
    pyr = [(i0n, i1n)]
    sizes = [(w, h)]
    for s in range(1, ns):
        pw, ph = sizes[-1]
        sizes.append(zoom_size(pw, ph, 0.5))
        a, b = pyr[-1]
        pyr.append((zoom_out(a, 0.5), zoom_out(b, 0.5)))

    prep = jax.jit(lambda a, b: tuple(x for p in pyr for x in p))
    total_lvl = 0.0
    u = jnp.zeros((sizes[-1][1], sizes[-1][0], 2), jnp.float32)
    for s in range(ns - 1, 0, -1):
        a, b = pyr[s]
        hh, ww = a.shape
        k_check = 8 if hh * ww > 200_000 else 24
        fn = jax.jit(
            lambda a=a, b=b, u=u: tvl1_single_scale_fused(
                a, b, u, k_check=k_check)
        )
        t = timeit(fn)
        total_lvl += t
        u = fn()
        print(f"  level {s}: {hh}x{ww} k_check={k_check}: {t:.2f} ms",
              flush=True)
        nw, nh = sizes[s - 1]
        u = jnp.stack(
            [zoom_in(u[..., 0], nw, nh), zoom_in(u[..., 1], nw, nh)],
            axis=-1) * 2.0

    # prologue glue: normalize + presmooth + pyramid build
    g = jax.jit(lambda a, b: [
        x for s in range(1, ns)
        for x in (zoom_out(gaussian_blur(*_normalize_pair(a, b)[:1], 0.8), 0.5),)
    ])
    print(f"  sum of level solves: {total_lvl:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

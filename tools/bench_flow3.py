"""In-jit per-level cost breakdown of tvl1_flow.

Times jitted PREFIXES of the pyramid+level chain (coarsest..level s) and
diffs successive prefixes, so every number includes the real in-program
cost of that level (kernel + zoom_in glue) with no per-call dispatch
noise.  Usage: python tools/bench_flow3.py [H W]
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
        num_scales, _normalize_pair, zoom_size,
    )
    from bwd_nlkalman_tpu.flow.tvl1_fused import tvl1_single_scale_fused
    from bwd_nlkalman_tpu.ops.gaussian import gaussian_blur
    from bwd_nlkalman_tpu.ops.zoom import zoom_out, zoom_in

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    sigma = 20.0
    rng = np.random.default_rng(0)
    base = rng.uniform(40, 215, (h + 8, w + 8)).astype(np.float32)
    i0 = jnp.asarray(base[:h, :w] + sigma * rng.standard_normal((h, w)).astype(np.float32))
    i1 = jnp.asarray(base[3:3 + h, 2:2 + w] + sigma * rng.standard_normal((h, w)).astype(np.float32))

    # mirror tvl1_flow's fscale=1 internals: work at half res
    fscale = 1
    ns_full = num_scales(w, h, 100, 0.5)

    def prefix(a, b, stop_level):
        """normalize + presmooth + pyramid + solve levels ns-1..stop."""
        a, b = _normalize_pair(a, b)
        a = gaussian_blur(a, 0.8)
        b = gaussian_blur(b, 0.8)
        pyr = [(a, b)]
        sizes = [(w, h)]
        for s in range(1, ns_full):
            pw, ph = sizes[-1]
            sizes.append(zoom_size(pw, ph, 0.5))
            pa, pb = pyr[-1]
            pyr.append((zoom_out(pa, 0.5), zoom_out(pb, 0.5)))
        u = jnp.zeros((sizes[-1][1], sizes[-1][0], 2), jnp.float32)
        for s in range(ns_full - 1, stop_level - 1, -1):
            pa, pb = pyr[s]
            hh, ww = pa.shape
            k_check = 8 if hh * ww > 200_000 else 24
            u = tvl1_single_scale_fused(pa, pb, u, k_check=k_check)
            if s > stop_level:
                nw, nh = sizes[s - 1]
                u = jnp.stack(
                    [zoom_in(u[..., 0], nw, nh), zoom_in(u[..., 1], nw, nh)],
                    axis=-1) * 2.0
        return u

    prev = None
    for stop in range(ns_full - 1, fscale - 1, -1):
        fn = jax.jit(lambda a, b, s=stop: prefix(a, b, s))
        t = timeit(lambda: fn(i0, i1))
        d = "" if prev is None else f"  (+{t - prev:6.2f} ms for this level)"
        print(f"prefix down to level {stop}: {t:7.2f} ms{d}", flush=True)
        prev = t

    # pyramid-only cost
    def pyr_only(a, b):
        a, b = _normalize_pair(a, b)
        a = gaussian_blur(a, 0.8)
        b = gaussian_blur(b, 0.8)
        outs = [a, b]
        for s in range(1, ns_full):
            a = zoom_out(a, 0.5)
            b = zoom_out(b, 0.5)
            outs += [a, b]
        return outs
    t = timeit(lambda: jax.jit(pyr_only)(i0, i1))
    print(f"pyramid build only: {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

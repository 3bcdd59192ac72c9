"""On-chip timing of the TV-L1 flow and its warp stage.

Usage: python tools/bench_flow.py [H W] (default 1080 1920; flow runs at
fscale=1, i.e. half resolution).
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


def timeit(name, fn, reps=3):
    t0 = time.perf_counter()
    sync(fn())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn()
    sync(o)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:34s}: {dt:8.1f} ms  (first {compile_s:.0f}s)", flush=True)
    return dt


def main():
    from bwd_nlkalman_tpu.flow import tvl1_flow
    from bwd_nlkalman_tpu.ops.warp import warp_bicubic_zero_multi
    from bwd_nlkalman_tpu.ops.grad import centered_gradient

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    rng = np.random.default_rng(0)
    i0 = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    i1 = jnp.asarray(np.roll(np.asarray(i0), (2, -3), (0, 1)))

    flow_fn = jax.jit(lambda a, b: tvl1_flow(a, b, fscale=1))
    timeit(f"tvl1_flow {h}x{w} fscale=1", lambda: flow_fn(i0, i1))

    # warp stage at the finest computed scale (half res)
    h2, w2 = h // 2, w // 2
    a = jnp.asarray(rng.uniform(0, 255, (h2, w2)).astype(np.float32))
    ax, ay = centered_gradient(a)
    i1s = jnp.stack([a, ax, ay], axis=-1)
    u = jnp.asarray(rng.uniform(-3, 3, (h2, w2)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-3, 3, (h2, w2)).astype(np.float32))

    @jax.jit
    def warp5(i1s, u, v):
        out = 0.0
        for k in range(5):
            wrp = warp_bicubic_zero_multi(i1s, u + k * 0.01, v)
            out = out + wrp
        return out

    timeit(f"5x warp_bicubic_zero_multi {h2}x{w2}", lambda: warp5(i1s, u, v))


if __name__ == "__main__":
    main()

"""On-chip timing of one NL-Kalman pass: fused Pallas kernel vs v2 engine.

Usage: python tools/bench_pass.py [H W] (default 1080 1920).
Env: BNLK_BENCH_ENGINES=pallas,v2  BNLK_BENCH_DTYPES=bfloat16,float32
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/bnlk_jax_cache")

import jax.numpy as jnp
from bwd_nlkalman_tpu.core.engine import dense_pass_v2, auto_rows_per_block
from bwd_nlkalman_tpu.core.engine_pallas import dense_pass_pallas
from bwd_nlkalman_tpu.params import default_params, FilterMode


def sync(o):
    if isinstance(o, tuple):
        o = o[0]
    return np.asarray(jax.device_get(o[:1, :1]))


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    sigma = 20.0
    rng = np.random.default_rng(0)
    cur = jnp.asarray(rng.uniform(0, 255, (h, w, 1)).astype(np.float32))
    prev = jnp.asarray(
        np.asarray(cur) + 3 * rng.standard_normal((h, w, 1)).astype(np.float32)
    )
    valid = jnp.ones((h, w), bool)
    p1 = default_params(sigma, FilterMode.FLT1)
    ps = default_params(sigma, FilterMode.SMO1)

    engines = os.environ.get("BNLK_BENCH_ENGINES", "pallas,v2").split(",")
    dtypes = os.environ.get("BNLK_BENCH_DTYPES", "bfloat16").split(",")

    for eng in engines:
        for wdt in dtypes:
            for mode, prms in (("filter", p1), ("smooth", ps)):
                if eng == "pallas":
                    fn = lambda: dense_pass_pallas(
                        cur, prev, valid, cur, sigma, prms, mode, True, False,
                        window_dtype=wdt,
                    )
                else:
                    rb = auto_rows_per_block(w, 1, 8, 10)
                    fn = lambda: dense_pass_v2(
                        cur, prev, valid, cur, sigma, prms, mode, True, False,
                        rb, window_dtype=wdt,
                    )
                t0 = time.perf_counter()
                out = fn()
                sync(out)
                compile_s = time.perf_counter() - t0
                reps = 3
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = fn()
                sync(out)
                dt = (time.perf_counter() - t0) / reps * 1000
                print(
                    f"{eng:7s} {wdt:9s} {mode:7s} {h}x{w}: {dt:8.1f} ms/pass"
                    f"  (first call {compile_s:.0f}s)",
                    flush=True,
                )


if __name__ == "__main__":
    main()

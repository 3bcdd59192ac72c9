"""EPE + speed of bf16 dual-plane storage in the fused TV-L1 solver.

Compares BNLK_TVL1_STATE_DTYPE=bfloat16 against float32 on a realistic
noisy 1080p pair (full multiscale, fscale=1): wall time and EPE between
the two flows.  Usage: python tools/bench_flow_bf16.py [H W]
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


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    sigma = 20.0
    rng = np.random.default_rng(0)
    base = rng.uniform(40, 215, (h + 8, w + 8)).astype(np.float32)
    i0 = jnp.asarray(base[:h, :w] + sigma * rng.standard_normal((h, w)).astype(np.float32))
    i1 = jnp.asarray(base[3:3 + h, 2:2 + w] + sigma * rng.standard_normal((h, w)).astype(np.float32))

    from bwd_nlkalman_tpu.flow.tvl1 import tvl1_flow

    flows = {}
    for dt in ("float32", "bfloat16"):
        os.environ["BNLK_TVL1_STATE_DTYPE"] = dt

        def g(a, b, _tag=dt):
            return tvl1_flow(a, b, fscale=1)

        f = jax.jit(g)
        sync(f(i0, i1))
        t0 = time.perf_counter()
        for _ in range(5):
            u = f(i0, i1)
        sync(u)
        dtms = (time.perf_counter() - t0) / 5 * 1000
        flows[dt] = np.asarray(u)
        print(f"state_dtype={dt}: {dtms:6.1f} ms", flush=True)
    os.environ["BNLK_TVL1_STATE_DTYPE"] = "float32"

    d = np.hypot(*(flows["bfloat16"] - flows["float32"]).transpose(2, 0, 1))
    print(f"EPE bf16 vs f32: mean {d.mean():.4f} max {d.max():.3f} px")


if __name__ == "__main__":
    main()

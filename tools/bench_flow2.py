"""End-to-end TV-L1 timing under different k_check policies + EPE impact.

The fused level kernel checks convergence every k_check iterations
(BNLK_TVL1_KC_FINE / BNLK_TVL1_KC_COARSE); this sweeps policies on the
real chip and reports time + EPE vs the default policy's flow.
Usage: python tools/bench_flow2.py [H W]
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


def _policy_fn(tvl1_flow, fine, coarse):
    # distinct closure per policy => distinct jit cache entry (the env
    # knobs are read at trace time)
    def g(a, b, _tag=(fine, coarse)):
        return tvl1_flow(a, b, fscale=1)
    return g


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    sigma = 20.0
    rng = np.random.default_rng(0)
    base = rng.uniform(40, 215, (h + 8, w + 8)).astype(np.float32)
    i0 = base[:h, :w] + sigma * rng.standard_normal((h, w)).astype(np.float32)
    i1 = base[3:3 + h, 2:2 + w] + sigma * rng.standard_normal((h, w)).astype(np.float32)
    i0 = jnp.asarray(i0)
    i1 = jnp.asarray(i1)

    from bwd_nlkalman_tpu.flow.tvl1 import tvl1_flow

    ref_u = None
    for fine, coarse in ((8, 24), (8, 300), (8, 48), (16, 300)):
        os.environ["BNLK_TVL1_KC_FINE"] = str(fine)
        os.environ["BNLK_TVL1_KC_COARSE"] = str(coarse)
        f = jax.jit(_policy_fn(tvl1_flow, fine, coarse))
        sync(f(i0, i1))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            u = f(i0, i1)
        sync(u)
        dt = (time.perf_counter() - t0) / reps * 1000
        un = np.asarray(u)
        if ref_u is None:
            ref_u = un
            d = 0.0
        else:
            d = float(np.hypot(*(un - ref_u).transpose(2, 0, 1)).mean())
        print(f"fine={fine:3d} coarse={coarse:3d}: {dt:6.1f} ms  "
              f"EPE vs baseline {d:.4f} px", flush=True)


if __name__ == "__main__":
    main()

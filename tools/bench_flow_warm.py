"""Warm-start flow cost vs solver effort at 1080p fscale=1 (VERDICT r4 #2).

Times tvl1_flow_warm on translating natural-statistics content (the
bench headline signal) for (nwarps, max_iters) variants, plus the cold
pyramid for reference, and reports end-point EPE of each variant vs the
cold solve — the quality signal that tools/flow_warm_gate.py checks at
PSNR level.

Usage: python tools/bench_flow_warm.py [H W]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/bnlk_jax_cache")
    import jax.numpy as jnp
    from bwd_nlkalman_tpu.flow.tvl1 import tvl1_flow, tvl1_flow_warm

    # natural-statistics translating scene (what bench.py uses)
    rng = np.random.default_rng(5)
    f = np.fft.rfftfreq(2 * w)[None, :] ** 2 + np.fft.fftfreq(2 * h)[:, None] ** 2
    spec = rng.standard_normal((2 * h, w + 1)) / np.maximum(np.sqrt(f), 1e-4)
    big = np.fft.irfft2(spec)
    big = (big - big.min()) / (big.max() - big.min()) * 235 + 10
    big = big.astype(np.float32)
    sigma = 20.0
    mk = lambda dy, dx: jnp.asarray(
        big[dy:dy + h, dx:dx + w]
        + sigma * rng.standard_normal((h, w)).astype(np.float32))
    i0, i1 = mk(8, 3), mk(5, 1)          # flow ~(2, 3) px

    def sync(o):
        return np.asarray(jax.device_get(o[1][:1, :1])
                          if isinstance(o, tuple) else o[:1, :1])

    def timeit(fn, *a, n=5):
        sync(fn(*a))
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*a)
        sync(o)
        return (time.perf_counter() - t0) / n

    fscale = 1
    cold = jax.jit(lambda a, b: tvl1_flow(a, b, fscale=fscale,
                                          return_carry=True))
    t_cold = timeit(cold, i0, i1)
    u_ref, u_fs = cold(i0, i1)
    u_ref = np.asarray(u_ref)
    print(f"cold pyramid: {t_cold*1e3:7.1f} ms", flush=True)

    for nwarps, maxit in [(5, 300), (5, 100), (3, 100), (2, 60), (1, 40)]:
        warm = jax.jit(lambda a, b, u, nw=nwarps, mi=maxit: tvl1_flow_warm(
            a, b, u, fscale=fscale, nwarps=nw, max_iters=mi))
        t = timeit(warm, i0, i1, u_fs)
        uo, _ = warm(i0, i1, u_fs)
        epe = float(np.mean(np.hypot(*(np.asarray(uo) - u_ref).transpose(2, 0, 1))))
        print(f"warm nwarps={nwarps} maxit={maxit}: {t*1e3:7.1f} ms   "
              f"EPE vs cold {epe:.4f} px", flush=True)


if __name__ == "__main__":
    main()

"""Diagnose single-chip multi-clip batching (VERDICT r3 weak #3).

Round-3 bench showed aggregate 2-clip throughput BELOW single-clip —
dispatching independent clips' steps back-to-back bought nothing.  This
measures, on the real chip, where the ceiling actually is:

1. kernel-level batch scaling: the fused TV-L1 level solve and the
   fused NLK pass, B=1 vs B=2 (vmap -> leading Pallas grid dimension).
   A TPU chip has ONE TensorCore: Pallas grid steps serialize, so
   near-2x time means the kernel already saturates the core and no
   batching scheme can beat 1x aggregate; well-below-2x means fixed
   per-launch overheads dominate and batching pays.
2. end-to-end batched scan (vmap'd denoise over (B,T,H,W,C)) vs the
   single-clip scan.  NOTE vmap of the warm path's residual-gate
   lax.cond turns into a select that executes BOTH branches, so the
   batched scan uses cold flow; the comparison baseline is the cold
   single-clip scan.

Usage: python tools/diag_batch.py [H W]   (default 1080 1920)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault("BNLK_WINDOW_DTYPE", "bfloat16")
os.environ.setdefault("BNLK_WARP_DTYPE", "bfloat16")

import numpy as np


def main():
    import jax
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/tmp/bnlk_jax_cache")
    import jax.numpy as jnp

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    sigma = 20.0
    rng = np.random.default_rng(0)

    def sync(o):
        return np.asarray(jax.device_get(jax.tree.leaves(o)[0].ravel()[:1]))

    def timeit(fn, *a, n=3):
        sync(fn(*a))
        t0 = time.perf_counter()
        for _ in range(n):
            sync(fn(*a))
        return (time.perf_counter() - t0) / n

    # ---- 1a. fused TV-L1 level, B=1 vs B=2 ----
    from bwd_nlkalman_tpu.flow.tvl1_fused import tvl1_single_scale_fused

    fh, fw = (h + 1) // 2, (w + 1) // 2
    a = jnp.asarray(rng.uniform(0, 255, (2, fh, fw)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 255, (2, fh, fw)).astype(np.float32))
    u0 = jnp.zeros((2, fh, fw, 2), jnp.float32)

    def solve1(a, b, u0):
        return tvl1_single_scale_fused(a[0], b[0], u0[0], epsilon=0.0,
                                       max_iters=64, k_check=8)

    solve2 = jax.jit(jax.vmap(
        lambda a, b, u: tvl1_single_scale_fused(a, b, u, epsilon=0.0,
                                                max_iters=64, k_check=8)))
    t1 = timeit(solve1, a, b, u0)
    t2 = timeit(solve2, a, b, u0)
    print(f"tvl1 level {fh}x{fw} (64 it x 5 warps): B=1 {t1*1e3:.1f} ms, "
          f"B=2 {t2*1e3:.1f} ms  -> batch-2 ratio {t2/t1:.2f}x "
          f"(2.0 = fully serialized, ~1.0 = launch-bound)")

    # ---- 1b. fused NLK filter pass, B=1 vs B=2 ----
    from bwd_nlkalman_tpu.core import nlkalman_filter_frame
    from bwd_nlkalman_tpu.params import default_params, FilterMode

    p1 = default_params(sigma, FilterMode.FLT1)
    cur = jnp.asarray(rng.uniform(0, 255, (2, h, w, 1)).astype(np.float32))
    prev = jnp.asarray(rng.uniform(0, 255, (2, h, w, 1)).astype(np.float32))
    valid = jnp.ones((2, h, w), bool)

    def nlk1(c, p, v):
        return nlkalman_filter_frame(c[0], p[0], v[0], None, sigma, p1)

    nlk2 = jax.jit(jax.vmap(
        lambda c, p, v: nlkalman_filter_frame(c, p, v, None, sigma, p1)))
    t1 = timeit(nlk1, cur, prev, valid)
    try:
        t2 = timeit(nlk2, cur, prev, valid)
        print(f"nlk filter {h}x{w}: B=1 {t1*1e3:.1f} ms, B=2 {t2*1e3:.1f} ms "
              f"-> batch-2 ratio {t2/t1:.2f}x")
    except Exception as e:
        # the fused NLK kernel streams raw rows from HBM (memory space
        # ANY) — Pallas TPU cannot batch such blocks, so the kernel is
        # NOT vmappable at all: multi-clip batching cannot reach inside
        # the dominant kernels on one chip
        print(f"nlk filter {h}x{w}: B=1 {t1*1e3:.1f} ms; vmap B=2 "
              f"unsupported by the fused kernel ({type(e).__name__}: "
              f"HBM-streamed blocks cannot take a batch grid dim)")

    # ---- 2. end-to-end batched scan (cold flow) ----
    from bwd_nlkalman_tpu.pipeline.sequence import (
        filter_sequence, smooth_sequence, FlowConfig)
    from bwd_nlkalman_tpu.params import FilterMode

    frames = int(os.environ.get("DIAG_FRAMES", 4))
    p2 = default_params(sigma, FilterMode.FLT2)
    ps = default_params(sigma, FilterMode.SMO1)
    cfg = FlowConfig()

    base = np.cumsum(np.cumsum(
        rng.standard_normal((h + 8, w + 8)), axis=0), axis=1)
    base = ((base - base.min()) / (base.max() - base.min()) * 175 + 40
            ).astype(np.float32)
    stack = np.stack(
        [base[i % 8 : i % 8 + h, i % 8 : i % 8 + w] for i in range(frames)]
    )[..., None]
    clip = stack + sigma * rng.standard_normal(stack.shape).astype(np.float32)
    clips2 = jnp.asarray(np.stack([clip, clip[:, ::-1]]))

    def one(v):
        _, flt2 = filter_sequence(v, sigma, p1, p2, cfg)
        return smooth_sequence(flt2, sigma, ps, cfg)

    t1 = timeit(lambda c: one(c[0]), clips2, n=1)
    print(f"end-to-end cold scan {frames}f: 1 clip {t1:.2f} s "
          f"({frames/t1:.2f} fps)")
    try:
        two = jax.jit(jax.vmap(one))
        t2 = timeit(two, clips2, n=1)
        print(f"vmap 2 clips {t2:.2f} s (aggregate {2*frames/t2:.2f} fps, "
              f"ratio {t2/t1:.2f}x)")
    except Exception as e:
        print(f"vmap 2-clip scan unsupported ({type(e).__name__}): the "
              f"fused NLK kernel cannot take a batch grid dim; single-chip "
              f"multi-clip aggregate is bounded by back-to-back dispatch "
              f"(see bench streaming figure).  Multi-clip throughput is a "
              f"multi-chip 'dp' axis concern (denoise_batch).")


if __name__ == "__main__":
    main()

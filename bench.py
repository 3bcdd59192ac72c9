"""Benchmark: 1080p grayscale frames/sec/chip at sigma=20.

Measures the full per-frame pipeline step (TV-L1 backward flow at fscale=1
+ occlusion mask + bicubic warps + two NL-Kalman filtering passes) on the
real TPU chip, scanning a sequence after one warmup compile.  Prints ONE
JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline is value / 30 fps — the BASELINE.json north star (the C
reference publishes no throughput numbers; 30 fps/chip at 1080p is the
target the driver records).

Env overrides: BENCH_H, BENCH_W, BENCH_FRAMES, BENCH_SIGMA.
"""

import json
import os
import sys
import time

# bf16 window tensors: PSNR-gated neutral (see ROUND_NOTES.md), ~16% faster
os.environ.setdefault("BNLK_WINDOW_DTYPE", "bfloat16")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/bnlk_jax_cache")
    import jax.numpy as jnp
    from bwd_nlkalman_tpu.params import default_params, FilterMode
    from bwd_nlkalman_tpu.pipeline.sequence import filter_frame_pair, FlowConfig

    h = int(os.environ.get("BENCH_H", 1080))
    w = int(os.environ.get("BENCH_W", 1920))
    frames = int(os.environ.get("BENCH_FRAMES", 4))
    sigma = float(os.environ.get("BENCH_SIGMA", 20.0))

    p1 = default_params(sigma, FilterMode.FLT1)
    p2 = default_params(sigma, FilterMode.FLT2)
    cfg = FlowConfig()

    @jax.jit
    def frame_step(frame, f1, f2):
        return filter_frame_pair(frame, f1, f2, sigma, p1, p2, cfg)

    def seq_step(noisy_frames, f1, f2):
        for t in range(noisy_frames.shape[0]):
            f1, f2 = frame_step(noisy_frames[t], f1, f2)
        return f1, f2

    rng = np.random.default_rng(0)
    base = rng.uniform(40, 215, (h + 8, w + 8)).astype(np.float32)
    stack = np.stack(
        [base[i % 8 : i % 8 + h, i % 8 : i % 8 + w] for i in range(frames)]
    )[..., None]
    noisy = jnp.asarray(stack + sigma * rng.standard_normal(stack.shape).astype(np.float32))
    f1 = noisy[0]
    f2 = noisy[0]

    def sync(o):
        # force completion with minimal transfer (block_until_ready does
        # not await remote completion on the tunneled axon platform)
        return np.asarray(jax.device_get(o[0][:1, :1]))

    # warmup/compile (per-frame step compiles once)
    sync(seq_step(noisy[:1], f1, f2))

    t0 = time.perf_counter()
    sync(seq_step(noisy, f1, f2))
    dt = time.perf_counter() - t0

    fps = frames / dt
    print(json.dumps({
        "metric": f"{h}p gray frames/sec/chip at sigma={sigma:g} (flow + two-pass NL-Kalman filter)",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 4),
    }))


if __name__ == "__main__":
    main()

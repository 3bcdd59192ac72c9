"""MFU / roofline accounting for the three hot kernels (VERDICT r3 #4).

Algorithmic FLOP counts come from the reference's cost structure
(src/nlkalman.c:637-702 distance scan of window^2 * psz^2 * ch, :746-811
group statistics, :281-299 DCT; lib/tvl1flow/tvl1flow_lib.c:142-246 the
primal-dual iteration), NOT from the implementation's instruction mix —
so the numbers answer "how close is the kernel to the minimum work the
algorithm requires at hardware speed".

Peaks used (TPU v5e, one chip):
- VPU nameplate f32:    ~3.95 TFLOP/s (8x128 lanes x 4 ALUs x 0.94 GHz)
- VPU MEASURED practical: ~0.81 TFLOP/s — tools/vpu_probe.py measured
  this chip sustains only ~0.38-0.46 vector-register ops/cycle for
  VMEM-streaming elementwise chains (FMA counted as one op; the planes
  of these kernels exceed the register file, so every op streams VMEM),
  and bf16 gives no packed-math gain.  The nameplate 4-ALU figure is
  unreachable for this instruction mix; `vpu_util` (vs nameplate) is
  kept for continuity and `vpu_util_practical` (vs measured) reports
  how close a kernel is to what the machine actually delivers.
- MXU bf16 matmul:      ~197 TFLOP/s (f32 operands ~1/4 of that)
- HBM bandwidth:        ~819 GB/s

The NL-Kalman pass is VPU-dominated (distances/statistics are rolled
elementwise ops; only the in-kernel DCT rides the MXU), and its working
set is VMEM-resident (HBM traffic = raw rows in + pixel rows out), so
the binding roofline is VPU/VMEM streaming throughput.  TV-L1's fused
level is pure VPU with the whole state in VMEM and a SERIAL dependency
chain between iterations (the serial-chain streaming rate is ~half the
ILP rate per the probe).

Usage:
  python tools/mfu.py                # measure on the current backend
  (bench.py imports nlk_pass_flops/tvl1_iter_flops for its mfu field)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

VPU_PEAK = 3.95e12     # nameplate f32 elementwise FLOP/s
# measured practical streaming ceiling (tools/vpu_probe.py, real v5e):
# ~0.42 vreg-ops/cycle * 1024 lanes * 2 FLOP(FMA) * 0.94 GHz
VPU_PRACTICAL = 0.81e12
MXU_PEAK_BF16 = 197e12
HBM_BW = 819e9


def nlk_pass_flops(h, w, ch, prms, mode="filter", temporal=True):
    """Algorithmic FLOPs for one NL-Kalman pass over an (h, w, ch) frame.

    Counts, per stride-psz/2 site (src/nlkalman.c:586-932):
    - distance scan: n_off * (psz^2*ch) * 3  (sub, mul, add  :687-702)
    - selection: exact k-th-smallest (bit bisection, 32 rounds of
      compare+count over n_off candidates ~ 2 ops each)
    - group statistics: n_off * F * 2 images * 3 (masked sum/sumsq
      :746-811), F = psz^2*ch + 1
    - Kalman/Wiener update: F * ~10 (:858-904)
    - aggregation: nagg * F * 4 DCT-domain gain/bias accumulation
    plus the DCT images: 2 separable psz-matmuls per pixel position per
    image = 4*psz^3*ch MXU FLOPs/pixel (3 images when has_basic).
    """
    psz = prms.patch_sz
    step = psz // 2
    rad = prms.search_sz_t if (temporal and mode == "filter") else (
        prms.search_sz_x if mode == "filter" else prms.search_sz_t)
    n_off = (2 * rad + 1) ** 2
    f = psz * psz * ch + 1
    sites = (h // step) * (w // step)
    per_site = (
        n_off * psz * psz * ch * 3          # distances
        + 32 * n_off * 2                     # bit-bisection selection
        + n_off * f * 2 * 3                  # statistics (cur+prev)
        + f * 10                             # update
        + prms.npatches_tagg * f * 4         # aggregation accumulate
        + f * 2 * psz * psz                  # finalize: inverse DCT fold
    )
    vpu = sites * per_site
    n_images = 3 if mode == "filter" else 2
    mxu = h * w * n_images * 4 * psz ** 3 * ch
    return vpu, mxu


def tvl1_iter_flops(h, w):
    """Algorithmic FLOPs of ONE primal-dual iteration at one level
    (tvl1flow_lib.c:165-245): threshold step ~12, u update ~10 (incl.
    divergence), forward gradients ~8, dual update ~22 (two hypot+
    normalize) => ~52/pixel; plus the error reduction ~4/pixel."""
    return 56 * h * w


def tvl1_warp_flops(h, w):
    """Bicubic warp of (i1, i1x, i1y) + rho_c/grad consts: 16-tap cubic
    ~ 3 channels * 50 + 10 per pixel (tvl1flow_lib.c:145-160)."""
    return 160 * h * w


def measure():
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/tmp/bnlk_jax_cache")

    from bwd_nlkalman_tpu.params import default_params, FilterMode
    from bwd_nlkalman_tpu.core import nlkalman_filter_frame, nlkalman_smooth_frame

    sigma = 20.0
    h, w, ch = 1080, 1920, 1
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.uniform(0, 255, (h, w, ch)).astype(np.float32))
    cur, prev = mk(), mk()
    valid = jnp.ones((h, w), bool)

    def sync(o):
        return np.asarray(jax.device_get(o[:1, :1]))

    def timeit(fn, *a, n=10):
        # dispatch all reps back-to-back and sync ONCE: on the tunneled
        # axon platform a per-rep sync adds a full host<->device round
        # trip (~10 ms) to every repetition, which inflated round-4's
        # per-pass numbers vs the profiler's device-time attribution
        # (49 ms "measured" vs 36.5 ms on device)
        sync(fn(*a))
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*a)
        sync(o)
        return (time.perf_counter() - t0) / n

    out = {}

    p1 = default_params(sigma, FilterMode.FLT1)
    dt = timeit(lambda a, b: nlkalman_filter_frame(a, b, valid, None, sigma, p1),
                cur, prev)
    vpu, mxu = nlk_pass_flops(h, w, ch, p1, "filter", temporal=True)
    out["nlk_filter"] = dict(
        ms=dt * 1e3, vpu_gflop=vpu / 1e9, mxu_gflop=mxu / 1e9,
        vpu_util=vpu / dt / VPU_PEAK,
        vpu_util_practical=vpu / dt / VPU_PRACTICAL,
        mxu_util=mxu / dt / MXU_PEAK_BF16)

    ps = default_params(sigma, FilterMode.SMO1)
    dt = timeit(lambda a, b: nlkalman_smooth_frame(a, b, valid, sigma, ps),
                cur, prev)
    vpu, mxu = nlk_pass_flops(h, w, ch, ps, "smooth")
    out["nlk_smooth"] = dict(
        ms=dt * 1e3, vpu_gflop=vpu / 1e9, mxu_gflop=mxu / 1e9,
        vpu_util=vpu / dt / VPU_PEAK,
        vpu_util_practical=vpu / dt / VPU_PRACTICAL,
        mxu_util=mxu / dt / MXU_PEAK_BF16)

    # fused TV-L1 level at the production fscale=1 resolution; epsilon=0
    # forces the iteration count so flops are known exactly
    from bwd_nlkalman_tpu.flow.tvl1_fused import (
        tvl1_single_scale_fused, fused_level_supported)

    fh, fw = 540, 960
    if fused_level_supported(fh, fw) and jax.default_backend() == "tpu":
        a = jnp.asarray(rng.uniform(0, 255, (fh, fw)).astype(np.float32))
        b = jnp.asarray(rng.uniform(0, 255, (fh, fw)).astype(np.float32))
        u0 = jnp.zeros((fh, fw, 2), jnp.float32)
        nwarps, iters = 5, 96

        def solve(a, b, u0):
            return tvl1_single_scale_fused(
                a, b, u0, nwarps=nwarps, epsilon=0.0, k_check=8,
                max_iters=iters)

        dt = timeit(solve, a, b, u0)
        fl = nwarps * (iters * tvl1_iter_flops(fh, fw) + tvl1_warp_flops(fh, fw))
        out["tvl1_level_540"] = dict(
            ms=dt * 1e3, vpu_gflop=fl / 1e9, iters=nwarps * iters,
            vpu_util=fl / dt / VPU_PEAK,
            vpu_util_practical=fl / dt / VPU_PRACTICAL)

    return out


if __name__ == "__main__":
    import json

    print(json.dumps(measure(), indent=1, default=float))

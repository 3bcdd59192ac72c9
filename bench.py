"""Benchmark: 1080p grayscale frames/sec/chip at sigma=20, FULL pipeline.

Measures the complete nlkalman-seq.sh equivalent per frame on the real
TPU chip: TV-L1 backward flow + occlusion + warps + two NL-Kalman filter
passes (forward scan), then TV-L1 forward flow + occlusion + warp + RTS
smoother pass (backward scan) — i.e. 2 flows + 3 NL-Kalman passes per
frame, nothing omitted.

Output contract (round-5 redesign; the round-4 bench lost its number to
a compile timeout because ONE print came after ~6 compiles):

  1. the headline JSON line {"metric","value","unit","vs_baseline"} is
     printed and FLUSHED immediately after the FIRST timed measurement
     (the warm-started production scan pipeline);
  2. every additional figure (cold-flow scan, worst-case content,
     streaming latency, aggregate clips, multiscale, MFU) is an "extra":
     each is appended INCREMENTALLY to BENCH_EXTRAS.json next to this
     file as it completes, and a refreshed JSON line (same headline
     value, richer metric string) is re-printed after extras finish —
     so a timeout mid-extras still leaves a parseable headline;
  3. BENCH_BUDGET_S (wall seconds, default 540) bounds the run: extras
     are skipped once the budget is near.  tools/prewarm.py pre-fills
     the persistent compile cache so the driver's run mostly measures.

Env overrides: BENCH_H, BENCH_W, BENCH_FRAMES, BENCH_SIGMA, BENCH_MS=0,
BENCH_CLIPS, BENCH_MFU=0, BENCH_BUDGET_S, BENCH_EXTRAS=0 (headline only).
"""

import json
import os
import sys
import time

# bf16 window tensors + warp taps: PSNR-gated (see ROUND_NOTES.md)
os.environ.setdefault("BNLK_WINDOW_DTYPE", "bfloat16")
os.environ.setdefault("BNLK_WARP_DTYPE", "bfloat16")

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

import numpy as np

T_START = time.perf_counter()
EXTRAS_PATH = os.path.join(_HERE, "BENCH_EXTRAS.json")


def budget_left():
    budget = float(os.environ.get("BENCH_BUDGET_S", 540))
    return budget - (time.perf_counter() - T_START)


class Extras:
    """Incrementally-flushed side artifact for non-headline figures."""

    def __init__(self, path):
        self.path = path
        self.data = {}

    def put(self, key, value):
        self.data[key] = value
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)


def make_content(h, w, frames, sigma):
    """Structured translating scene + AWGN — the same natural-statistics
    protocol as the parity/PSNR tooling (tests/test_pipeline.make_sequence)
    and the reference's own DAVIS/derf evals."""
    rng = np.random.default_rng(0)
    base = np.cumsum(np.cumsum(
        rng.standard_normal((h + 8, w + 8)), axis=0), axis=1)
    base = ((base - base.min()) / (base.max() - base.min()) * 175 + 40
            ).astype(np.float32)
    stack = np.stack(
        [base[i % 8 : i % 8 + h, i % 8 : i % 8 + w] for i in range(frames)]
    )[..., None]
    noisy = stack + sigma * rng.standard_normal(stack.shape).astype(np.float32)
    # worst case: white-noise texture as the clean signal (the r01/r02
    # content) — TV-L1 never converges there and runs to its iteration cap
    wc_base = rng.uniform(40, 215, (h + 8, w + 8)).astype(np.float32)
    wc = np.stack(
        [wc_base[i % 8 : i % 8 + h, i % 8 : i % 8 + w] for i in range(frames)]
    )[..., None]
    noisy_wc = wc + sigma * rng.standard_normal(wc.shape).astype(np.float32)
    return noisy, noisy_wc


def emit_headline(h, sigma, fps, detail):
    print(json.dumps({
        "metric": (
            f"{h}p gray full-pipeline frames/sec/chip at sigma={sigma:g} "
            f"(2 TV-L1 flows + 2-pass filter + RTS smoother per frame, "
            f"warm-started gated streaming flow, structured-scene content "
            f"per the parity protocol{detail})"
        ),
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 4),
    }), flush=True)


def main():
    import jax
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:  # plugin platforms can otherwise win regardless of the env
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/tmp/bnlk_jax_cache")
    import jax.numpy as jnp
    from bwd_nlkalman_tpu.params import default_params, FilterMode
    from bwd_nlkalman_tpu.pipeline.sequence import (
        filter_frame_pair, FlowConfig, filter_sequence, smooth_sequence,
    )
    from bwd_nlkalman_tpu.core import nlkalman_smooth_frame
    from bwd_nlkalman_tpu.flow import occlusion_mask
    from bwd_nlkalman_tpu.flow.tvl1 import luma
    from bwd_nlkalman_tpu.ops.color import rgb2opp, opp2rgb
    from bwd_nlkalman_tpu.ops.warp import warp_bicubic_nan

    h = int(os.environ.get("BENCH_H", 1080))
    w = int(os.environ.get("BENCH_W", 1920))
    frames = int(os.environ.get("BENCH_FRAMES", 4))
    sigma = float(os.environ.get("BENCH_SIGMA", 20.0))
    run_extras = os.environ.get("BENCH_EXTRAS", "1") != "0"

    p1 = default_params(sigma, FilterMode.FLT1)
    p2 = default_params(sigma, FilterMode.FLT2)
    ps = default_params(sigma, FilterMode.SMO1)
    cfg = FlowConfig()
    # reduced warm effort (3 re-linearization stages instead of 5): a
    # converged carry needs fewer warp stages than a zero iterate —
    # PSNR-gated in-suite by tests/test_warm_effort_gate.py; the residual
    # gate still falls back to the full-effort cold pyramid on scene cuts
    cfg_warm = FlowConfig(warm_start=True, warm_nwarps=3)

    noisy_np, noisy_wc_np = make_content(h, w, frames, sigma)
    noisy = jnp.asarray(noisy_np)

    def sync(o):
        # force completion with minimal transfer (block_until_ready does
        # not await remote completion on the tunneled axon platform)
        return np.asarray(jax.device_get(o[:1, :1]))

    # ---- headline: the PRODUCTION scan drivers (pipeline.sequence) ----
    # The whole clip is one dispatch, like nlkalman-seq.sh end to end,
    # with the warm-started streaming TV-L1 (residual-gated; PSNR-validated
    # by tools/flow_warm_gate.py: scene content takes the warm branch 100%
    # of steps at identical PSNR, scene cuts fall back to the cold pyramid).
    def scan_pipeline(noisy_frames, c):
        _, flt2 = filter_sequence(noisy_frames, sigma, p1, p2, c)
        return smooth_sequence(flt2, sigma, ps, c)

    # warm at the IDENTICAL shape: the scan jits specialize on the frame
    # count, so a shorter warmup clip would leave the timed call compiling
    sync(scan_pipeline(noisy, cfg_warm)[0])
    t0 = time.perf_counter()
    sync(scan_pipeline(noisy, cfg_warm)[0])
    dt = time.perf_counter() - t0
    fps = frames / dt

    # >>> the un-losable print: headline out the door before anything else
    emit_headline(h, sigma, fps, "")

    if not run_extras:
        return
    ex = Extras(EXTRAS_PATH)
    ex.put("headline_fps", round(fps, 3))
    ex.put("config", {"h": h, "w": w, "frames": frames, "sigma": sigma})

    # ---- extras, each budget-gated and individually fault-isolated ----
    detail = []

    def extra(key, min_budget_s, fn):
        if budget_left() < min_budget_s:
            ex.put(key, "skipped:budget")
            return
        try:
            val, txt = fn()
            ex.put(key, val)
            if txt:
                detail.append(txt)
        except Exception as e:  # never sink the remaining extras
            ex.put(key, f"failed:{type(e).__name__}")

    def cold_scan():
        # cold-flow scan (the reference's per-frame full-pyramid recompute)
        sync(scan_pipeline(noisy, cfg)[0])
        t0 = time.perf_counter()
        sync(scan_pipeline(noisy, cfg)[0])
        v = frames / (time.perf_counter() - t0)
        return round(v, 3), f"cold-flow scan {v:.2f} fps"

    extra("cold_fps", 60, cold_scan)

    def worst_case():
        nz = jnp.asarray(noisy_wc_np)
        sync(scan_pipeline(nz, cfg_warm)[0])
        t0 = time.perf_counter()
        sync(scan_pipeline(nz, cfg_warm)[0])
        v = frames / (time.perf_counter() - t0)
        return round(v, 3), f"worst-case white-noise content {v:.2f} fps"

    extra("worst_case_fps", 30, worst_case)

    # per-frame streaming latency (host-dispatched steps)
    @jax.jit
    def filter_step(frame, f1, f2):
        return filter_frame_pair(frame, f1, f2, sigma, p1, p2, cfg)

    @jax.jit
    def smooth_step(flt2_t, smo_next):
        flow = cfg.flow(luma(flt2_t), luma(smo_next))
        occ = occlusion_mask(flow, cfg.occ_threshold)
        w0, v0 = warp_bicubic_nan(rgb2opp(smo_next), flow, occ)
        return opp2rgb(
            nlkalman_smooth_frame(rgb2opp(flt2_t), w0, v0, sigma, ps)
        )

    def full_pipeline(noisy_frames, f1, f2):
        flt2 = []
        for t in range(noisy_frames.shape[0]):
            f1, f2 = filter_step(noisy_frames[t], f1, f2)
            flt2.append(f2)
        smo = flt2[-1]
        for t in range(len(flt2) - 2, -1, -1):
            smo = smooth_step(flt2[t], smo)
        return smo

    def latency():
        f1 = f2 = noisy[0]
        sync(full_pipeline(noisy[:2], f1, f2))
        t0 = time.perf_counter()
        sync(full_pipeline(noisy, f1, f2))
        v = frames / (time.perf_counter() - t0)
        return round(v, 3), f"streaming per-frame latency {v:.2f} fps"

    extra("latency_fps", 90, latency)

    # aggregate throughput with several clips in flight (the GNU-parallel
    # analogue, scripts/dev-scripts/train-nn-smoothing.sh:118-120)
    nclips = int(os.environ.get("BENCH_CLIPS", 2))

    def aggregate():
        clip_f1 = [noisy[0]] * nclips
        clip_f2 = [noisy[0]] * nclips

        def batched_pipeline(noisy_frames):
            nonlocal clip_f1, clip_f2
            flt2 = [[] for _ in range(nclips)]
            for t in range(noisy_frames.shape[0]):
                for b in range(nclips):
                    clip_f1[b], clip_f2[b] = filter_step(
                        noisy_frames[t], clip_f1[b], clip_f2[b])
                    flt2[b].append(clip_f2[b])
            smo = [flt2[b][-1] for b in range(nclips)]
            for t in range(noisy_frames.shape[0] - 2, -1, -1):
                for b in range(nclips):
                    smo[b] = smooth_step(flt2[b][t], smo[b])
            return smo[0]

        sync(batched_pipeline(noisy[:2]))
        t0 = time.perf_counter()
        sync(batched_pipeline(noisy))
        v = nclips * frames / (time.perf_counter() - t0)
        return round(v, 3), f"aggregate {nclips} clips {v:.2f} fps"

    if nclips > 1:
        extra("aggregate_fps", 120, aggregate)

    if os.environ.get("BENCH_MS", "1") != "0":
        def multiscale():
            # multiscale msnlkalman (BASELINE config 5): per-frame pyramid
            # decompose + per-level flow/filter + recompose, multiscale
            # backward smoothing.  Host loop with per-level jitted steps.
            from bwd_nlkalman_tpu.pipeline.multiscale import _filter_level
            from bwd_nlkalman_tpu.ops.pyramid import (
                dct_decompose, dct_recompose, auto_pyramid_levels,
            )
            levels = auto_pyramid_levels(h, w)
            sig_l = [sigma / (2.0 ** l) for l in range(levels)]
            mp1 = [default_params(s, FilterMode.FLT1) for s in sig_l]
            mp2 = [default_params(s, FilterMode.FLT2) for s in sig_l]
            deco = jax.jit(lambda img: tuple(dct_decompose(img, levels, 2.0)))
            reco = jax.jit(lambda lv: dct_recompose(list(lv), 0.7))
            lvl_step = [
                jax.jit(lambda n, a, b, l=l: _filter_level(
                    n, a, b, sig_l[l], mp1[l], mp2[l]))
                for l in range(levels)
            ]
            lvl_first = [
                jax.jit(lambda n, l=l: _filter_level(
                    n, None, None, sig_l[l], mp1[l], mp2[l]))
                for l in range(levels)
            ]
            smo_lvl = [
                jax.jit(lambda f, s, l=l: smooth_step(f, s))
                for l in range(levels)
            ]

            def ms_pipeline(noisy_frames):
                t_n = noisy_frames.shape[0]
                prev1 = prev2 = None
                flt2_lv = []
                for t in range(t_n):
                    pyr_n = deco(noisy_frames[t])
                    if prev2 is None:
                        outs = [lvl_first[l](pyr_n[l]) for l in range(levels)]
                    else:
                        pyr_f1 = deco(prev1)
                        pyr_f2 = deco(prev2)
                        outs = [
                            lvl_step[l](pyr_n[l], pyr_f1[l], pyr_f2[l])
                            for l in range(levels)
                        ]
                    f11 = [o[0] for o in outs]
                    f21 = [o[1] for o in outs]
                    prev1 = reco(tuple(f11)) if levels > 1 else f11[0]
                    prev2 = reco(tuple(f21)) if levels > 1 else f21[0]
                    flt2_lv.append(f21)
                smo = [flt2_lv[-1][l] for l in range(levels)]
                for t in range(t_n - 2, -1, -1):
                    smo = [smo_lvl[l](flt2_lv[t][l], smo[l])
                           for l in range(levels)]
                return reco(tuple(smo)) if levels > 1 else smo[0]

            sync(ms_pipeline(noisy[:2]))
            t0 = time.perf_counter()
            sync(ms_pipeline(noisy))
            v = frames / (time.perf_counter() - t0)
            return round(v, 3), f"msnlkalman {levels}-level {v:.2f} fps"

        extra("multiscale_fps", 150, multiscale)

    if os.environ.get("BENCH_MFU", "1") != "0":
        def mfu_extra():
            # MFU / roofline accounting for the hot kernels (tools/mfu.py):
            # algorithmic FLOPs vs v5e VPU peak — the NLK passes and TV-L1
            # are VPU/VMEM-bound, not MXU-bound
            sys.path.insert(0, os.path.join(_HERE, "tools"))
            from mfu import measure as mfu_measure
            m = {k: round(v["vpu_util"], 4) for k, v in mfu_measure().items()}
            return m, f"VPU-roofline util {m}"

        extra("mfu", 60, mfu_extra)

    ex.put("elapsed_s", round(time.perf_counter() - T_START, 1))
    # re-print the headline with the extras folded into the metric string
    # (same value — the LAST JSON line is the richest, any line parses)
    emit_headline(h, sigma, fps, "; " + "; ".join(detail) if detail else "")


if __name__ == "__main__":
    main()

"""PSNR gate for warm-started streaming TV-L1 (FlowConfig.warm_start).

The warm path replaces the coarse-to-fine initialization of every
in-scan flow solve with the previous scan step's level-fscale solution
(flow/tvl1.py:tvl1_flow_warm); solver, stopping rule and parameters are
the reference's own.  This runs the parity-scale scene through the full
pipeline cold vs warm and prints PSNR + wall time; a scene-CUT variant
(the adversarial case for a stale carry: the motion field flips sign
mid-clip) checks the warp stages re-converge from a wrong init.

Usage: python tools/flow_warm_gate.py [config ...]
  default: 540g 1080g
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import numpy as np

CONFIGS = {
    "540g": dict(h=540, w=960, c=1, sigma=20.0, t=6),
    "540g40": dict(h=540, w=960, c=1, sigma=40.0, t=6),
    "540rgb": dict(h=540, w=960, c=3, sigma=20.0, t=6),
    "1080g": dict(h=1080, w=1920, c=1, sigma=20.0, t=4),
    "1080g40": dict(h=1080, w=1920, c=1, sigma=40.0, t=4),
}


def run(clean, noisy, sigma, warm):
    from bwd_nlkalman_tpu.pipeline import denoise_sequence, sequence_psnr
    from bwd_nlkalman_tpu.pipeline.sequence import FlowConfig

    cfg = FlowConfig(warm_start=warm)
    t0 = time.perf_counter()
    _, flt2, smo = denoise_sequence(noisy, sigma, flow_cfg=cfg)
    flt2 = np.asarray(flt2)
    smo = np.asarray(smo)
    dt = time.perf_counter() - t0
    p2 = sequence_psnr(clean, flt2, first_frame=1)["psnr"]
    ps = sequence_psnr(clean[:-1], smo[:-1])["psnr"]
    return p2, ps, dt


def main():
    names = sys.argv[1:] or ["540g", "1080g"]

    import jax
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:  # the axon plugin ignores the env var alone
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/tmp/bnlk_jax_cache")
    from bwd_nlkalman_tpu.pipeline import add_noise_sequence
    from test_pipeline import make_sequence

    for name in names:
        cfg = CONFIGS[name]
        h, w, c, sigma, t = cfg["h"], cfg["w"], cfg["c"], cfg["sigma"], cfg["t"]
        rng = np.random.default_rng(77)
        clean = make_sequence(rng, t=t, h=h, w=w, c=c)
        noisy = np.asarray(
            add_noise_sequence(clean, sigma, seeds=[700 + i for i in range(t)])
        )

        # scene cut: second half plays the motion BACKWARD (carry is the
        # negation of the true flow at the cut frame)
        cut = np.concatenate([clean[: t // 2], clean[t // 2 :][::-1]], axis=0)
        cut_noisy = np.asarray(
            add_noise_sequence(cut, sigma, seeds=[900 + i for i in range(t)])
        )

        for label, cl, nz in (("scene", clean, noisy), ("cut", cut, cut_noisy)):
            for warm in (False, True):
                p2, ps, dt = run(cl, nz, sigma, warm)
                print(
                    f"{name:8s} {label:6s} {'warm' if warm else 'cold'}: "
                    f"flt2 {p2:.3f} dB  smo1 {ps:.3f} dB  "
                    f"(wall {dt:.0f}s incl compile)",
                    flush=True,
                )


if __name__ == "__main__":
    main()

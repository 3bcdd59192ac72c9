"""PSNR gate for the TV-L1 iteration cap (FlowConfig.max_iters).

Level-1/2 solves run to the reference's 300-iteration cap on noisy
content (the while never converges there), so the cap IS the flow cost.
This runs the parity-scale scene through OUR full pipeline at several
caps and prints the PSNRs; compare against the cap=300 run recorded by
tools/parity_scale.py (same scene, same noise).

Usage: python tools/flow_maxit_gate.py [config] [caps...]
  default: 1080g 300 200 150 100
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
    "1080g": dict(h=1080, w=1920, c=1, sigma=20.0, t=4),
    "1080g40": dict(h=1080, w=1920, c=1, sigma=40.0, t=4),
}


def main():
    cfgname = sys.argv[1] if len(sys.argv) > 1 else "1080g"
    caps = [int(a) for a in sys.argv[2:]] or [300, 200, 150, 100]
    cfg = CONFIGS[cfgname]
    h, w, c, sigma, t = cfg["h"], cfg["w"], cfg["c"], cfg["sigma"], cfg["t"]

    import jax
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:  # the axon plugin ignores the env var alone
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/tmp/bnlk_jax_cache")
    from bwd_nlkalman_tpu.pipeline import (
        add_noise_sequence, denoise_sequence, sequence_psnr,
    )
    from bwd_nlkalman_tpu.pipeline.sequence import FlowConfig
    from test_pipeline import make_sequence

    rng = np.random.default_rng(77)
    clean = make_sequence(rng, t=t, h=h, w=w, c=c)
    noisy = add_noise_sequence(clean, sigma, seeds=[700 + i for i in range(t)])

    import jax.numpy as jnp
    for cap in caps:
        # TRACED cap: every cap reuses the first cap's compiled executable
        t0 = time.perf_counter()
        flt1, flt2, smo = denoise_sequence(
            noisy, sigma, flow_dyn={"max_iters": jnp.asarray(cap, jnp.int32)})
        flt2 = np.asarray(flt2)
        smo = np.asarray(smo)
        dt = time.perf_counter() - t0
        p2 = sequence_psnr(clean, flt2, first_frame=1)["psnr"]
        ps = sequence_psnr(clean[:-1], smo[:-1])["psnr"]
        print(f"maxit={cap:4d}: flt2 {p2:.3f} dB  smo1 {ps:.3f} dB  "
              f"(wall {dt:.0f}s incl compile)", flush=True)


if __name__ == "__main__":
    main()

"""In-suite PSNR gate for the bench's reduced warm-flow effort.

bench.py's headline configuration runs the warm-started streaming TV-L1
at REDUCED effort (FlowConfig.warm_nwarps=3 instead of the cold path's
5 re-linearization stages): a converged carry from the previous scan
step needs fewer warp stages than a zero iterate (EPE-vs-cold < 0.03 px,
tools/bench_flow_warm.py).  This asserts the exact benched configuration
costs <= 0.05 dB on the full pipeline vs full-effort warm flow —
continuously validated in-suite, same pattern as test_bf16_gate.py
(VERDICT r4 ask #3).
"""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax.numpy as jnp

from bwd_nlkalman_tpu.pipeline import denoise_sequence, sequence_psnr
from bwd_nlkalman_tpu.pipeline.sequence import FlowConfig
from bwd_nlkalman_tpu.params import NLKParams

PRMS1 = NLKParams(
    patch_sz=8, search_sz_x=6, search_sz_t=3,
    npatches_x=12, npatches_t=8, npatches_tagg=4,
    dista_lambda=1.0, beta_x=3.0, beta_t=2.0,
)
PRMS2 = NLKParams(
    patch_sz=8, search_sz_x=6, search_sz_t=3,
    npatches_x=10, npatches_t=8, npatches_tagg=4,
    dista_lambda=1.0, beta_x=2.5, beta_t=1.8,
)
PRMSS = NLKParams(
    patch_sz=8, search_sz_x=0, search_sz_t=3,
    npatches_x=0, npatches_t=8, npatches_tagg=8,
    dista_lambda=1.0, beta_x=0.0, beta_t=4.0,
)


def _run(noisy, sigma, cfg):
    out = denoise_sequence(
        jnp.asarray(noisy), sigma, PRMS1, PRMS2, PRMSS, flow_cfg=cfg)
    return tuple(np.asarray(o) for o in out)


def test_warm_reduced_effort_within_tolerance(rng):
    sigma = 20.0
    h, w, t = 72, 96, 6
    yy, xx = np.meshgrid(np.arange(h + 16), np.arange(w + 16), indexing="ij")
    base = 120 + 80 * np.sin(0.08 * xx) * np.cos(0.1 * yy)
    # translating scene: real motion so the flow actually matters
    clean = np.stack(
        [base[2 * i : 2 * i + h, i : i + w] for i in range(t)])[..., None]
    noisy = (clean + sigma * rng.standard_normal(clean.shape)).astype(
        np.float32)

    full = FlowConfig(fscale=1, warm_start=True)
    # the EXACT benched configuration (bench.py cfg_warm)
    reduced = FlowConfig(fscale=1, warm_start=True, warm_nwarps=3)

    _, flt2_f, smo_f = _run(noisy, sigma, full)
    _, flt2_r, smo_r = _run(noisy, sigma, reduced)

    p2_f = sequence_psnr(clean, flt2_f, first_frame=1)["psnr"]
    p2_r = sequence_psnr(clean, flt2_r, first_frame=1)["psnr"]
    ps_f = sequence_psnr(clean[:-1], smo_f[:-1])["psnr"]
    ps_r = sequence_psnr(clean[:-1], smo_r[:-1])["psnr"]
    print(f"flt2 warm-full {p2_f:.3f} vs warm-nwarps3 {p2_r:.3f}; "
          f"smo1 warm-full {ps_f:.3f} vs warm-nwarps3 {ps_r:.3f}")
    assert p2_r > p2_f - 0.05
    assert ps_r > ps_f - 0.05

"""Warm-started streaming (per-frame host dispatch) == the warm scan driver.

StreamingDenoiser with flow_cfg.warm_start seeds the level-fscale carry
with a cold full-pyramid solve on the first temporal frame (step_seed)
and warm-starts every further frame (step_warm), mirroring
filter_sequence's peeled warm scan exactly.
"""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax.numpy as jnp

from bwd_nlkalman_tpu.pipeline.sequence import filter_sequence, FlowConfig
from bwd_nlkalman_tpu.pipeline.stream import StreamingDenoiser
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


def test_streaming_warm_matches_scan(rng):
    sigma = 10.0
    t, h, w = 4, 64, 72
    yy, xx = np.meshgrid(np.arange(h + 8), np.arange(w + 8), indexing="ij")
    base = 110 + 70 * np.sin(0.09 * xx) * np.cos(0.12 * yy)
    clean = np.stack([base[i : i + h, i : i + w] for i in range(t)])[..., None]
    noisy = (clean + sigma * rng.standard_normal(clean.shape)).astype(np.float32)

    cfg = FlowConfig(fscale=1, warm_start=True)
    _, flt2_scan = filter_sequence(jnp.asarray(noisy), sigma, PRMS1, PRMS2, cfg)

    sd = StreamingDenoiser(sigma, PRMS1, PRMS2, flow_cfg=cfg)
    flt2_stream = np.stack([sd.step(noisy[i])[1] for i in range(t)])
    assert sd.u_fs is not None  # the warm carry is live

    np.testing.assert_allclose(
        flt2_stream, np.asarray(flt2_scan), rtol=1e-4, atol=2e-3)


def test_streaming_warm_checkpoint_roundtrip(rng, tmp_path):
    # IDENTICAL config + frame shape as test_streaming_warm_matches_scan:
    # _jitted_steps is lru_cached per configuration, so this reuses the
    # already-compiled steps instead of re-tracing (XLA-CPU compiles of
    # the warm flow are ~30 s each)
    sigma = 10.0
    noisy = rng.uniform(0, 255, (3, 64, 72, 1)).astype(np.float32)
    cfg = FlowConfig(fscale=1, warm_start=True)
    sd = StreamingDenoiser(sigma, PRMS1, PRMS2, flow_cfg=cfg)
    for i in range(3):
        sd.step(noisy[i])
    path = str(tmp_path / "ckpt.npz")
    sd.save_state(path)

    sd2 = StreamingDenoiser(sigma, PRMS1, PRMS2, flow_cfg=cfg)
    sd2.load_state(path)
    assert sd2.u_fs is not None
    np.testing.assert_array_equal(np.asarray(sd2.u_fs), np.asarray(sd.u_fs))

"""End-to-end sharded sequence driver == single-chip scan (8-dev CPU mesh).

denoise_sequence_sharded composes GSPMD-partitioned flow/warp/occlusion
with the shard_map NL-Kalman passes; this asserts the whole pipeline
(filter scan + backward smoothing, flow included) matches the single-chip
denoise_sequence on the virtual mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from bwd_nlkalman_tpu.parallel import make_mesh
from bwd_nlkalman_tpu.parallel.sequence import denoise_sequence_sharded
from bwd_nlkalman_tpu.pipeline.sequence import denoise_sequence, FlowConfig
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


def _clip(rng, t, h, w, c=1):
    yy, xx = np.meshgrid(np.arange(h + 8), np.arange(w + 8), indexing="ij")
    base = 110 + 70 * np.sin(0.09 * xx) * np.cos(0.12 * yy)
    frames = [base[i : i + h, i : i + w] for i in range(t)]
    clean = np.stack(frames)[..., None].repeat(c, -1)
    return (clean + 10 * rng.standard_normal(clean.shape)).astype(np.float32)


@pytest.mark.parametrize("warm", [False, True])
def test_sharded_sequence_matches_single(rng, warm):
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(dp=1, sp=4, devices=jax.devices()[:4])
    sigma = 10.0
    noisy = jnp.asarray(_clip(rng, 4, 96, 64))
    cfg = FlowConfig(fscale=1, warm_start=warm)

    ref = denoise_sequence(noisy, sigma, PRMS1, PRMS2, PRMSS, flow_cfg=cfg)
    got = denoise_sequence_sharded(
        noisy, sigma, mesh, PRMS1, PRMS2, PRMSS, flow_cfg=cfg)
    for r, g, name in zip(ref, got, ("flt1", "flt2", "smo1")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=1e-3, atol=5e-2, err_msg=name)

"""Parity of the fused Pallas NL-Kalman kernel vs the v2 XLA engine.

Runs in Pallas interpret mode on the CPU test platform; the kernel and
the v2 engine implement identical semantics (both validated against the
numpy oracle / C reference), so they must agree to f32 reduction-order
tolerance.  On-chip compiled parity is exercised by tools/check_pallas_engine.py
(BNLK_CHECK_TPU=1) and the bench.
"""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from bwd_nlkalman_tpu.core.engine import dense_pass_v2
from bwd_nlkalman_tpu.core.engine_pallas import (
    dense_pass_pallas,
    pallas_pass_supported,
)
from bwd_nlkalman_tpu.params import NLKParams

PRMS = NLKParams(
    patch_sz=8, search_sz_x=6, search_sz_t=3,
    npatches_x=12, npatches_t=8, npatches_tagg=4,
    dista_lambda=1.0, beta_x=3.0, beta_t=2.0,
)
SPRMS = NLKParams(
    patch_sz=8, search_sz_x=6, search_sz_t=3,
    npatches_x=0, npatches_t=8, npatches_tagg=8,
    dista_lambda=1.0, beta_x=0.0, beta_t=4.0,
)


def _inputs(rng, h=32, w=40, ch=1, sigma=20.0):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    clean = (100 + 60 * np.sin(0.1 * xx) + 50 * np.cos(0.13 * yy))[..., None]
    clean = np.repeat(clean, ch, -1).astype(np.float32)
    cur = clean + sigma * rng.standard_normal(clean.shape).astype(np.float32)
    prev = clean + 2 * rng.standard_normal(clean.shape).astype(np.float32)
    valid = np.ones((h, w), bool)
    valid[10:14, 20:26] = False
    basic = clean + 4 * rng.standard_normal(clean.shape).astype(np.float32)
    return cur, np.where(valid[..., None], prev, 0.0), valid, basic


CASES = [
    ("filter", False, False, PRMS, 1),
    ("filter", True, False, PRMS, 1),
    ("filter", True, True, PRMS, 1),
    ("smooth", True, False, SPRMS, 1),
    ("smooth", False, False, SPRMS, 1),
    ("filter", True, False, PRMS, 3),
]


@pytest.mark.parametrize("mode,has_prev,has_basic,prms,ch", CASES)
def test_pallas_matches_v2(rng, mode, has_prev, has_basic, prms, ch):
    sigma = 20.0
    cur, prev, valid, basic = _inputs(rng, ch=ch)
    cur_j = jnp.asarray(cur)
    prev_j = jnp.asarray(prev) if has_prev else jnp.zeros_like(cur_j)
    valid_j = jnp.asarray(valid if has_prev else np.zeros(valid.shape, bool))
    basic_j = jnp.asarray(basic) if has_basic else cur_j

    args = (cur_j, prev_j, valid_j, basic_j, sigma, prms, mode,
            has_prev, has_basic)
    want = np.asarray(dense_pass_v2(*args))
    got = np.asarray(dense_pass_pallas(*args, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-2)


def test_pallas_matches_v2_wide_blockgate(rng):
    """Width => c4p=256: exercises the per-128-lane-block gating of the
    spatial-fallback (outer-offset) groups — frame-edge invalid sites in
    one block, an occlusion blob in the other, most rows all-temporal."""
    sigma = 20.0
    h, w = 24, 560
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    clean = (100 + 60 * np.sin(0.07 * xx) + 50 * np.cos(0.13 * yy))[..., None]
    clean = clean.astype(np.float32)
    cur = clean + sigma * rng.standard_normal(clean.shape).astype(np.float32)
    prev = clean + 2 * rng.standard_normal(clean.shape).astype(np.float32)
    valid = np.ones((h, w), bool)
    valid[:, :3] = False            # always-invalid frame edge (block 0)
    valid[8:12, 400:420] = False    # occlusion blob (block 1)
    prev = np.where(valid[..., None], prev, 0.0)

    args = (jnp.asarray(cur), jnp.asarray(prev), jnp.asarray(valid),
            jnp.asarray(cur), sigma, PRMS, "filter", True, False)
    want = np.asarray(dense_pass_v2(*args))
    got = np.asarray(dense_pass_pallas(*args, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-2)


def test_edgesplit_matches_v2(rng):
    """Edge-hybrid ownership split (border site columns owned by narrow
    strips, interior by a full-width pass) == v2 on a frame with the
    realistic validity pattern: invalid warp border band + an interior
    occlusion blob."""
    from bwd_nlkalman_tpu.core.engine_pallas import (
        dense_pass_pallas_edgesplit)

    sigma = 20.0
    h, w = 24, 560
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    clean = (100 + 60 * np.sin(0.07 * xx) + 50 * np.cos(0.13 * yy))[..., None]
    clean = clean.astype(np.float32)
    cur = clean + sigma * rng.standard_normal(clean.shape).astype(np.float32)
    prev = clean + 2 * rng.standard_normal(clean.shape).astype(np.float32)
    valid = np.ones((h, w), bool)
    valid[:, :2] = valid[:, -2:] = False    # warp border band
    valid[:2] = valid[-2:] = False
    valid[8:12, 300:330] = False            # interior occlusion blob
    prev = np.where(valid[..., None], prev, 0.0)

    args = (jnp.asarray(cur), jnp.asarray(prev), jnp.asarray(valid),
            jnp.asarray(cur), sigma, PRMS, "filter", True, False)
    want = np.asarray(dense_pass_v2(*args))
    got = np.asarray(dense_pass_pallas_edgesplit(*args, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-2)


def test_supported_predicate():
    p = NLKParams(
        patch_sz=8, search_sz_x=10, search_sz_t=5,
        npatches_x=50, npatches_t=30, npatches_tagg=20,
        dista_lambda=1.0, beta_x=3.0, beta_t=2.0,
    )
    assert pallas_pass_supported(1080, 1920, 1, p, "filter")
    assert pallas_pass_supported(1080, 1920, 1, p, "smooth")
    # odd patch size unsupported
    assert not pallas_pass_supported(
        128, 128, 1, NLKParams(
            patch_sz=7, search_sz_x=6, search_sz_t=3,
            npatches_x=5, npatches_t=5, npatches_tagg=2,
            dista_lambda=1.0, beta_x=1.0, beta_t=1.0,
        ), "filter",
    )

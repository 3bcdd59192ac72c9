"""Site-level validation of the dense NL-Kalman kernels vs. a numpy oracle.

The oracle (tests/oracle.py) implements the reference C semantics directly
(mask-skip disabled); the dense JAX kernels must reproduce it to float32
tolerance on generic random inputs (distances are almost surely distinct,
so top-k tie-breaking cannot diverge).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bwd_nlkalman_tpu.core import (
    nlkalman_filter_frame,
    nlkalman_smooth_frame,
    patch_validity,
)
from bwd_nlkalman_tpu.params import NLKParams, FilterMode, default_params

from oracle import nlk_pass_oracle


def _mkframe(rng, h, w, ch, sigma):
    clean = np.zeros((h, w, ch), np.float32)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    for c in range(ch):
        clean[..., c] = (
            100.0
            + 60.0 * np.sin(0.1 * xx + 0.3 * c)
            + 50.0 * np.cos(0.13 * yy - 0.2 * c)
        )
    noisy = clean + sigma * rng.standard_normal(clean.shape).astype(np.float32)
    return clean.astype(np.float32), noisy.astype(np.float32)


SMALL_PRMS = NLKParams(
    patch_sz=8, search_sz_x=6, search_sz_t=3,
    npatches_x=12, npatches_t=8, npatches_tagg=4,
    dista_lambda=1.0, beta_x=3.0, beta_t=2.0,
)


def test_patch_validity():
    v = np.ones((12, 12), bool)
    v[5, 7] = False
    pv = np.asarray(patch_validity(jnp.asarray(v), 4))
    assert pv.shape == (9, 9)
    assert not pv[4, 6]  # patches containing (5,7)
    assert not pv[2, 4]
    assert pv[0, 0]
    assert pv[5, 8]


@pytest.mark.parametrize("ch", [1, 3])
def test_filter_spatial_vs_oracle(rng, ch):
    sigma = 20.0
    _, noisy = _mkframe(rng, 32, 40, ch, sigma)
    got = np.asarray(
        nlkalman_filter_frame(jnp.asarray(noisy), None, None, None, sigma, SMALL_PRMS)
    )
    want = nlk_pass_oracle(noisy, None, None, None, sigma, SMALL_PRMS, "filter")
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-2)


def test_filter_temporal_vs_oracle(rng):
    sigma = 20.0
    clean, noisy = _mkframe(rng, 32, 40, 1, sigma)
    # previous denoised frame: clean + small noise, with an invalid blob
    prev = clean + 2.0 * rng.standard_normal(clean.shape).astype(np.float32)
    valid = np.ones((32, 40), bool)
    valid[10:14, 20:26] = False
    got = np.asarray(
        nlkalman_filter_frame(
            jnp.asarray(noisy), jnp.asarray(prev), jnp.asarray(valid), None,
            sigma, SMALL_PRMS,
        )
    )
    want = nlk_pass_oracle(noisy, prev, valid, None, sigma, SMALL_PRMS, "filter")
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-2)


def test_filter_second_pass_vs_oracle(rng):
    sigma = 20.0
    clean, noisy = _mkframe(rng, 32, 32, 1, sigma)
    prev = clean + 2.0 * rng.standard_normal(clean.shape).astype(np.float32)
    basic = clean + 4.0 * rng.standard_normal(clean.shape).astype(np.float32)
    valid = np.ones((32, 32), bool)
    valid[:6] = False
    got = np.asarray(
        nlkalman_filter_frame(
            jnp.asarray(noisy), jnp.asarray(prev), jnp.asarray(valid),
            jnp.asarray(basic), sigma, SMALL_PRMS,
        )
    )
    want = nlk_pass_oracle(noisy, prev, valid, basic, sigma, SMALL_PRMS, "filter")
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-2)


def test_smoother_vs_oracle(rng):
    sigma = 20.0
    clean, _ = _mkframe(rng, 32, 40, 1, sigma)
    filt = clean + 3.0 * rng.standard_normal(clean.shape).astype(np.float32)
    smo_next = clean + 1.5 * rng.standard_normal(clean.shape).astype(np.float32)
    valid = np.ones((32, 40), bool)
    valid[0:5, 0:9] = False
    prms = NLKParams(
        patch_sz=8, search_sz_x=6, search_sz_t=3,
        npatches_x=0, npatches_t=8, npatches_tagg=8,
        dista_lambda=1.0, beta_x=0.0, beta_t=4.0,
    )
    got = np.asarray(
        nlkalman_smooth_frame(
            jnp.asarray(filt), jnp.asarray(smo_next), jnp.asarray(valid),
            sigma, prms,
        )
    )
    want = nlk_pass_oracle(filt, smo_next, valid, None, sigma, prms, "smooth")
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-2)


def test_filter_denoises(rng):
    """End-to-end sanity: default params reduce noise in the interior.

    Border crop mirrors the reference eval protocol (PSNR with 10px crop,
    scripts/dev-scripts/nlkalman-train.sh:35).
    """
    sigma = 20.0
    clean, noisy = _mkframe(rng, 64, 64, 1, sigma)
    prms = default_params(sigma, FilterMode.FLT1)
    out = np.asarray(
        nlkalman_filter_frame(jnp.asarray(noisy), None, None, None, sigma, prms)
    )
    sl = np.s_[10:-10, 10:-10]
    mse_in = np.mean((noisy[sl] - clean[sl]) ** 2)
    mse_out = np.mean((out[sl] - clean[sl]) ** 2)
    assert mse_out < 0.6 * mse_in


def test_chunking_invariance(rng):
    """Output must not depend on the site chunk size."""
    sigma = 10.0
    _, noisy = _mkframe(rng, 40, 40, 1, sigma)
    a = nlkalman_filter_frame(
        jnp.asarray(noisy), None, None, None, sigma, SMALL_PRMS, chunk_sites=16
    )
    b = nlkalman_filter_frame(
        jnp.asarray(noisy), None, None, None, sigma, SMALL_PRMS, chunk_sites=1000
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-3)

"""Spatially-sharded kernels must match the single-chip kernels exactly,
on a virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bwd_nlkalman_tpu.core import nlkalman_filter_frame, nlkalman_smooth_frame
from bwd_nlkalman_tpu.parallel import make_mesh, spatial_filter_frame, spatial_smooth_frame
from bwd_nlkalman_tpu.params import NLKParams

PRMS = NLKParams(
    patch_sz=8, search_sz_x=6, search_sz_t=3,
    npatches_x=12, npatches_t=8, npatches_tagg=4,
    dista_lambda=1.0, beta_x=3.0, beta_t=2.0,
)


@pytest.fixture(scope="module")
def mesh4():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    return make_mesh(dp=1, sp=4, devices=jax.devices()[:4])


def _frame(rng, h, w, c=1):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = 100 + 60 * np.sin(0.11 * xx) * np.cos(0.13 * yy)
    return (base[..., None].repeat(c, -1) + 15 * rng.standard_normal((h, w, c))).astype(
        np.float32
    )


def test_sharded_filter_matches_single(rng, mesh4):
    sigma = 15.0
    noisy = _frame(rng, 96, 64)
    ref = np.asarray(
        nlkalman_filter_frame(jnp.asarray(noisy), None, None, None, sigma, PRMS)
    )
    got = np.asarray(
        spatial_filter_frame(jnp.asarray(noisy), None, None, None, sigma, PRMS, mesh4)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-3)


def test_sharded_temporal_filter_matches_single(rng, mesh4):
    sigma = 15.0
    noisy = _frame(rng, 96, 64)
    prev = noisy + 3 * rng.standard_normal(noisy.shape).astype(np.float32)
    valid = np.ones((96, 64), bool)
    valid[40:50, 10:30] = False
    ref = np.asarray(
        nlkalman_filter_frame(
            jnp.asarray(noisy), jnp.asarray(prev), jnp.asarray(valid), None, sigma, PRMS
        )
    )
    got = np.asarray(
        spatial_filter_frame(
            jnp.asarray(noisy), jnp.asarray(prev), jnp.asarray(valid), None,
            sigma, PRMS, mesh4,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-3)


def test_sharded_smoother_matches_single(rng, mesh4):
    sigma = 15.0
    filt = _frame(rng, 96, 64)
    nxt = filt + 2 * rng.standard_normal(filt.shape).astype(np.float32)
    valid = np.ones((96, 64), bool)
    valid[:9, :] = False
    prms = NLKParams(
        patch_sz=8, search_sz_x=0, search_sz_t=3,
        npatches_x=0, npatches_t=8, npatches_tagg=8,
        dista_lambda=1.0, beta_x=0.0, beta_t=4.0,
    )
    ref = np.asarray(
        nlkalman_smooth_frame(
            jnp.asarray(filt), jnp.asarray(nxt), jnp.asarray(valid), sigma, prms
        )
    )
    got = np.asarray(
        spatial_smooth_frame(
            jnp.asarray(filt), jnp.asarray(nxt), jnp.asarray(valid), sigma, prms, mesh4
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-3)


def test_denoise_batch_dp(mesh4, rng):
    """Batch of clips sharded over dp (here dp=1 mesh, mechanics check)."""
    import jax
    from bwd_nlkalman_tpu.parallel import make_mesh
    from bwd_nlkalman_tpu.pipeline import denoise_batch

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mesh = make_mesh(dp=2, sp=1, devices=jax.devices()[:2])
    clips = rng.uniform(0, 255, (2, 2, 48, 48, 1)).astype(np.float32)
    flt1, flt2, smo1 = denoise_batch(clips, 20.0, mesh=mesh)
    assert flt2.shape == clips.shape
    assert np.isfinite(np.asarray(smo1)).all()


def test_batched_dpsp_pass_matches_single(rng):
    """(B,H,W,C) batched shard_map over ('dp','sp') == per-sample single-chip."""
    from bwd_nlkalman_tpu.parallel.spatial import _spatial_pass

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(dp=2, sp=4)
    sigma = 15.0
    batch = np.stack([_frame(rng, 96, 64), _frame(rng, 96, 64)])
    zeros = jnp.zeros_like(jnp.asarray(batch))
    novalid = jnp.zeros(batch.shape[:3], bool)
    got = np.asarray(_spatial_pass(
        jnp.asarray(batch), zeros, novalid, jnp.asarray(batch),
        sigma, PRMS, "filter", False, False, mesh, 256,
    ))
    for i in range(2):
        ref = np.asarray(nlkalman_filter_frame(
            jnp.asarray(batch[i]), None, None, None, sigma, PRMS))
        np.testing.assert_allclose(got[i], ref, rtol=1e-4, atol=2e-3)

"""Spatially-sharded kernels must match the single-chip kernels exactly,
on a virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

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


def test_sharded_pallas_matches_single_pallas(rng):
    """The fused Pallas kernel on the sharded path (site_rows/qy_bounds,
    interpret mode on the CPU mesh) == the single-chip fused kernel."""
    from bwd_nlkalman_tpu.core.engine_pallas import dense_pass_pallas
    from bwd_nlkalman_tpu.parallel.spatial import _spatial_pass

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mesh = make_mesh(dp=1, sp=2, devices=jax.devices()[:2])
    prms = NLKParams(
        patch_sz=4, search_sz_x=3, search_sz_t=2,
        npatches_x=8, npatches_t=6, npatches_tagg=4,
        dista_lambda=1.0, beta_x=3.0, beta_t=2.0,
    )
    sigma = 15.0
    h, w = 64, 32
    noisy = _frame(rng, h, w)
    prev = noisy + 3 * rng.standard_normal(noisy.shape).astype(np.float32)
    valid = np.ones((h, w), bool)
    valid[30:40, 5:20] = False
    prev_z = jnp.where(jnp.asarray(valid)[..., None], jnp.asarray(prev), 0.0)

    ref = np.asarray(dense_pass_pallas(
        jnp.asarray(noisy), prev_z, jnp.asarray(valid), jnp.asarray(noisy),
        sigma, prms, "filter", True, False, interpret=True,
    ))
    got = np.asarray(_spatial_pass(
        jnp.asarray(noisy), prev_z, jnp.asarray(valid), jnp.asarray(noisy),
        sigma, prms, "filter", True, False, mesh, 256, engine="pallas",
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-3)


def test_sharded_production_params_temporal(rng):
    """Production configuration across shards: psz=8, search 10/5 (halo
    20 rows) on a 160-row frame with a flow-warped previous frame and a
    real validity mask (VERDICT round-2 item 4)."""
    from bwd_nlkalman_tpu.ops.warp import warp_bicubic_nan

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(dp=1, sp=4, devices=jax.devices()[:4])
    prms = NLKParams(
        patch_sz=8, search_sz_x=10, search_sz_t=5,
        npatches_x=40, npatches_t=30, npatches_tagg=20,
        dista_lambda=1.0, beta_x=3.0, beta_t=2.0,
    )
    sigma = 20.0
    h, w = 160, 96
    noisy = _frame(rng, h, w)
    prev_raw = np.roll(noisy, (2, -1), (0, 1))
    flow = jnp.broadcast_to(
        jnp.asarray([1.3, -2.1], jnp.float32), (h, w, 2)
    )
    warped, valid = warp_bicubic_nan(jnp.asarray(prev_raw), flow)
    ref = np.asarray(nlkalman_filter_frame(
        jnp.asarray(noisy), warped, valid, None, sigma, prms))
    got = np.asarray(spatial_filter_frame(
        jnp.asarray(noisy), warped, valid, None, sigma, prms, mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-3)

"""Round-3 features: fused whole-level TV-L1, matmul resampling,
training fixtures + precomputed-flow drivers."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _scene(t, h, w, c, rng):
    """Slowly translating smooth texture."""
    base = np.cumsum(np.cumsum(rng.normal(size=(h + 2 * t, w + 2 * t, c)), 0), 1)
    base = (base - base.min()) / (base.max() - base.min()) * 200 + 20
    return np.stack(
        [base[2 * i : 2 * i + h, i : i + w] for i in range(t)]
    ).astype(np.float32)


class TestFusedFlowLevel:
    def test_interpret_parity_vs_xla(self, rng):
        """Whole-level fused kernel == the XLA single-scale solver at the
        same convergence granularity (tvl1flow_lib.c:93-275)."""
        import bwd_nlkalman_tpu.flow.tvl1 as T
        from bwd_nlkalman_tpu.flow.tvl1 import tvl1_flow_single_scale
        from bwd_nlkalman_tpu.flow.tvl1_fused import tvl1_single_scale_fused

        h, w = 25, 41
        base = np.cumsum(np.cumsum(rng.normal(size=(h + 8, w + 8)), 0), 1)
        base = ((base - base.min()) / (base.max() - base.min()) * 255).astype(
            np.float32
        )
        i0 = jnp.asarray(base[4 : 4 + h, 4 : 4 + w])
        i1 = jnp.asarray(base[2 : 2 + h, 5 : 5 + w])
        u0 = jnp.zeros((h, w, 2), jnp.float32)

        # cap iterations to bound the interpret cost
        ref = tvl1_flow_single_scale(
            i0, i1, u0, nwarps=2, check_every=8, max_iters=32
        )
        out = tvl1_single_scale_fused(
            i0, i1, u0, nwarps=2, k_check=8, max_iters=32, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

        # single-iteration semantics must match to fp exactness (no
        # chaotic threshold amplification at 1 step)
        ref1 = tvl1_flow_single_scale(
            i0, i1, u0, nwarps=1, check_every=1, max_iters=1
        )
        out1 = tvl1_single_scale_fused(
            i0, i1, u0, nwarps=1, k_check=1, max_iters=1, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1), atol=1e-5)

    def test_supported_plan(self):
        from bwd_nlkalman_tpu.flow.tvl1_fused import fused_level_supported

        assert fused_level_supported(540, 960)
        assert not fused_level_supported(4000, 4000)

    def test_traced_iteration_cap(self, rng):
        """The cap rides SMEM (traced): a jnp scalar cap must equal the
        same int cap bit-exactly, and different caps must reuse one
        compiled executable (no retrace of the jitted solve)."""
        from bwd_nlkalman_tpu.flow.tvl1_fused import tvl1_single_scale_fused

        h, w = 25, 41
        base = np.cumsum(np.cumsum(rng.normal(size=(h + 8, w + 8)), 0), 1)
        base = ((base - base.min()) / (base.max() - base.min()) * 255).astype(
            np.float32
        )
        i0 = jnp.asarray(base[4 : 4 + h, 4 : 4 + w])
        i1 = jnp.asarray(base[2 : 2 + h, 5 : 5 + w])
        u0 = jnp.zeros((h, w, 2), jnp.float32)

        a = tvl1_single_scale_fused(
            i0, i1, u0, nwarps=2, k_check=8, max_iters=24, interpret=True
        )
        b = tvl1_single_scale_fused(
            i0, i1, u0, nwarps=2, k_check=8,
            max_iters=jnp.asarray(24, jnp.int32), interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # a different traced cap changes the result (the cap binds) but
        # not the trace count (one executable serves every cap)
        n0 = tvl1_single_scale_fused._cache_size()
        c = tvl1_single_scale_fused(
            i0, i1, u0, nwarps=2, k_check=8,
            max_iters=jnp.asarray(8, jnp.int32), interpret=True,
        )
        assert tvl1_single_scale_fused._cache_size() == n0
        assert not np.array_equal(np.asarray(b), np.asarray(c))

    def test_driver_flow_dyn_override(self, rng):
        """denoise_sequence(flow_dyn={traced scalars}) == the static
        FlowConfig pipeline at the same cap/data-weight/occ threshold."""
        from bwd_nlkalman_tpu.pipeline import denoise_sequence
        from bwd_nlkalman_tpu.pipeline.sequence import FlowConfig

        noisy = jnp.asarray(
            _scene(3, 40, 48, 1, rng)
            + 10 * rng.standard_normal((3, 40, 48, 1)).astype(np.float32)
        )
        ref = denoise_sequence(
            noisy, 20.0,
            flow_cfg=FlowConfig(max_iters=16, lambda_=0.2, occ_threshold=0.6),
        )
        out = denoise_sequence(
            noisy, 20.0,
            flow_dyn={
                "max_iters": jnp.asarray(16, jnp.int32),
                "lambda_": jnp.asarray(0.2, jnp.float32),
                "occ_threshold": jnp.asarray(0.6, jnp.float32),
            },
        )
        for r, o in zip(ref[:2], out[:2]):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(o))

    def test_flow_dyn_sweep_no_retrace(self, rng):
        """Sweeping the data weight through flow_dyn binds (different
        flows) and reuses one compiled executable (the reference's
        2d-search-filtering-oflow.sh economy)."""
        from bwd_nlkalman_tpu.pipeline.sequence import filter_sequence

        noisy = jnp.asarray(
            _scene(3, 40, 48, 1, rng)
            + 10 * rng.standard_normal((3, 40, 48, 1)).astype(np.float32)
        )
        outs, n0 = [], None
        for lam in (0.15, 0.45):
            _, f2 = filter_sequence(
                noisy, 20.0,
                flow_dyn={"lambda_": jnp.asarray(lam, jnp.float32),
                          "max_iters": jnp.asarray(60, jnp.int32)},
            )
            outs.append(np.asarray(f2))
            if n0 is None:
                n0 = filter_sequence._cache_size()
        assert filter_sequence._cache_size() == n0
        assert not np.array_equal(outs[0], outs[1])


class TestMatmulResample:
    def test_zoom_out_matches_gather_oracle(self, rng):
        """Matrix zoom_out == the explicit blur+bicubic-sample
        formulation (zoom.c:43-79)."""
        from bwd_nlkalman_tpu.ops.gaussian import gaussian_blur, _kernel_np
        from bwd_nlkalman_tpu.ops.zoom import zoom_out, zoom_size

        h, w = 37, 53
        img = rng.uniform(0, 255, (h, w)).astype(np.float32)
        out = np.asarray(zoom_out(jnp.asarray(img), 0.5))
        nxx, nyy = zoom_size(w, h, 0.5)
        assert out.shape == (nyy, nxx)

        # oracle: numpy blur (same taps) + Catmull-Rom sampling at (2j, 2i)
        import math
        sigma = 0.6 * math.sqrt(1.0 / 0.25 - 1.0)
        size = int(5 * sigma) + 1
        kern = _kernel_np(sigma)

        def blur1d(x):
            wdim = x.shape[1]
            left = x[:, size:0:-1]
            right = x[:, wdim - 1 : wdim - size - 1 : -1]
            xp = np.concatenate([left, x, right], axis=1)
            acc = np.zeros_like(x)
            for j in range(2 * size - 1):
                acc += kern[j] * xp[:, j + 1 : j + 1 + wdim]
            return acc

        ims = blur1d(blur1d(img).T).T
        # factor 0.5 samples at exactly integer coords -> value copy
        oracle = ims[: 2 * nyy : 2, : 2 * nxx : 2]
        np.testing.assert_allclose(out, oracle, atol=2e-3)

    def test_zoom_in_interpolates(self, rng):
        from bwd_nlkalman_tpu.ops.zoom import zoom_in

        img = rng.uniform(0, 255, (12, 17)).astype(np.float32)
        out = np.asarray(zoom_in(jnp.asarray(img), 34, 24))
        assert out.shape == (24, 34)
        # exact 2x upsample copies source samples at even coords
        np.testing.assert_allclose(out[::2, ::2], img, atol=1e-3)


class TestDistanceVariants:
    """LAMBDA_DISTANCE (src/nlkalman.c:647-684) and the non-K dista_th
    threshold selection (src/nlkalman.h:32) — compile-time variants of
    the reference, exposed as v2-engine parameters."""

    def _data(self, rng):
        h, w = 24, 28
        cur = rng.uniform(0, 255, (h, w, 1)).astype(np.float32)
        prev = (cur + 4 * rng.standard_normal((h, w, 1))).astype(np.float32)
        valid = np.ones((h, w), bool)
        return jnp.asarray(cur), jnp.asarray(prev), jnp.asarray(valid)

    def test_lambda_one_is_default(self, rng):
        import dataclasses
        from bwd_nlkalman_tpu.core.engine import dense_pass_v2
        from bwd_nlkalman_tpu.params import NLKParams

        cur, prev, valid = self._data(rng)
        p = NLKParams(patch_sz=4, search_sz_x=3, search_sz_t=2,
                      npatches_x=8, npatches_t=6, npatches_tagg=4,
                      beta_x=2.0, beta_t=2.0, dista_lambda=1.0)
        a = dense_pass_v2(cur, prev, valid, cur, 10.0, p, "filter", True,
                          False)
        b = dense_pass_v2(cur, prev, valid, cur, 10.0,
                          dataclasses.replace(p, dista_lambda=0.5),
                          "filter", True, False)
        # the blended distance changes the candidate sets
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        # but remains a sane denoiser (not a blow-up)
        assert np.abs(np.asarray(b) - np.asarray(cur)).mean() < 30

    def test_dista_th_large_equals_select_all(self, rng):
        import dataclasses
        from bwd_nlkalman_tpu.core.engine import dense_pass_v2
        from bwd_nlkalman_tpu.params import NLKParams

        cur, prev, valid = self._data(rng)
        n_off = (2 * 3 + 1) ** 2
        p_th = NLKParams(patch_sz=4, search_sz_x=3, search_sz_t=3,
                         npatches_x=1, npatches_t=1, npatches_tagg=1,
                         beta_x=2.0, beta_t=2.0, dista_lambda=1.0,
                         dista_th=1e4)
        p_all = dataclasses.replace(
            p_th, dista_th=0.0, npatches_x=n_off, npatches_t=n_off,
            npatches_tagg=n_off,
        )
        a = dense_pass_v2(cur, prev, valid, cur, 10.0, p_th, "filter",
                          True, False)
        b = dense_pass_v2(cur, prev, valid, cur, 10.0, p_all, "filter",
                          True, False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_pallas_rejects_variants(self, rng):
        from bwd_nlkalman_tpu.core.engine_pallas import (
            dense_pass_pallas, pallas_pass_supported)
        from bwd_nlkalman_tpu.params import NLKParams

        cur, prev, valid = self._data(rng)
        p = NLKParams(patch_sz=4, search_sz_x=3, search_sz_t=2,
                      npatches_x=8, npatches_t=6, npatches_tagg=4,
                      beta_x=2.0, beta_t=2.0, dista_lambda=0.5)
        assert not pallas_pass_supported(24, 28, 1, p, "filter")
        with pytest.raises(ValueError):
            dense_pass_pallas(cur, prev, valid, cur, 10.0, p, "filter",
                              True, False, interpret=True)


class TestStreamingSmoothers:
    def test_streaming_fsmo_equals_scan(self, rng):
        """Streaming fsmo == the whole-clip fsmo_sequence scan
        (scripts/nlkalman-fsmo-seq.sh:58-94)."""
        from bwd_nlkalman_tpu.pipeline.sequence import fsmo_sequence
        from bwd_nlkalman_tpu.pipeline.stream import StreamingDenoiser

        clean = _scene(5, 32, 40, 1, rng)
        noisy = clean + 10 * rng.standard_normal(clean.shape).astype(np.float32)
        f1s, f2s, smos = fsmo_sequence(jnp.asarray(noisy), 20.0)

        sd = StreamingDenoiser(20.0, smoother="fsmo")
        for t in range(5):
            f1, f2 = sd.step(noisy[t])
            np.testing.assert_allclose(f2, np.asarray(f2s[t]), atol=1e-3)
            np.testing.assert_allclose(
                np.asarray(sd.smo), np.asarray(smos[t]), atol=1e-3
            )

    def test_streaming_lsmo_equals_scan(self, rng):
        from bwd_nlkalman_tpu.pipeline.sequence import (
            filter_sequence, lsmo_sequence)
        from bwd_nlkalman_tpu.pipeline.stream import StreamingDenoiser

        clean = _scene(4, 32, 40, 1, rng)
        noisy = clean + 10 * rng.standard_normal(clean.shape).astype(np.float32)
        _, f2s = filter_sequence(jnp.asarray(noisy), 20.0)
        lsms = lsmo_sequence(f2s, 20.0)

        sd = StreamingDenoiser(20.0, smoother="lsmo")
        got = [None] * 4
        for t in range(4):
            sd.step(noisy[t])
            if sd.lsm is not None:
                got[t - 1] = np.asarray(sd.lsm)
        got[3] = sd.finalize()
        for t in range(4):
            np.testing.assert_allclose(got[t], np.asarray(lsms[t]), atol=1e-3)

    def test_kill_resume_checkpoint(self, rng, tmp_path):
        """Periodic async checkpoint + resume reproduces the uninterrupted
        run exactly."""
        from bwd_nlkalman_tpu.pipeline.stream import run_streaming

        clean = _scene(6, 24, 32, 1, rng)
        noisy = clean + 10 * rng.standard_normal(clean.shape).astype(np.float32)
        ck = str(tmp_path / "state.npz")

        full = run_streaming(lambda i: noisy[i], 0, 5, 20.0,
                             smoother="fsmo", checkpoint_every=2)
        # run frames 0..2 with checkpointing, "crash", resume 3..5
        run_streaming(lambda i: noisy[i], 0, 2, 20.0, checkpoint_path=ck,
                      smoother="fsmo", checkpoint_every=1)
        resumed = run_streaming(lambda i: noisy[i], 0, 5, 20.0,
                                checkpoint_path=ck, smoother="fsmo",
                                checkpoint_every=2)
        assert len(resumed) == 3     # only frames 3..5 recomputed
        for (f1a, f2a), (f1b, f2b) in zip(full[3:], resumed):
            np.testing.assert_allclose(f2a, f2b, atol=1e-4)


class TestTrainingFixtures:
    def test_fixtures_and_precomputed_drivers(self, rng, tmp_path):
        from bwd_nlkalman_tpu.train import cached_fixtures
        from bwd_nlkalman_tpu.pipeline.sequence import (
            filter_sequence_precomputed, smooth_sequence_precomputed)

        clean = _scene(4, 32, 40, 1, rng)
        seeds = list(range(4))
        fx = cached_fixtures(str(tmp_path), "toy", clean, 20.0, seeds)
        assert fx.bflow.shape == (4, 32, 40, 2)
        # frame 0 copies frame 1 (tvl1flow-seq.sh:43)
        np.testing.assert_array_equal(fx.bflow[0], fx.bflow[1])
        np.testing.assert_array_equal(fx.fflow[-1], fx.fflow[-2])

        # cache round trip is exact
        fx2 = cached_fixtures(str(tmp_path), "toy", clean, 20.0, seeds)
        np.testing.assert_array_equal(fx.noisy, fx2.noisy)
        np.testing.assert_array_equal(fx.bflow, fx2.bflow)

        flt1, flt2 = filter_sequence_precomputed(
            jnp.asarray(fx.noisy), jnp.asarray(fx.bflow),
            jnp.asarray(fx.bocc), 20.0,
        )
        smo1 = smooth_sequence_precomputed(
            flt2, jnp.asarray(fx.fflow), jnp.asarray(fx.focc), 20.0
        )

        def psnr(a, b):
            return 10 * np.log10(255.0 ** 2 / np.mean((a - b) ** 2))

        noisy_psnr = psnr(fx.noisy, clean)
        assert psnr(np.asarray(flt2), clean) > noisy_psnr + 4
        assert psnr(np.asarray(smo1), clean) > noisy_psnr + 4

    def test_evaluate_consumes_fixtures(self, rng, tmp_path):
        from bwd_nlkalman_tpu.train import cached_fixtures, evaluate
        from bwd_nlkalman_tpu.params import default_params, FilterMode

        clean = _scene(3, 24, 32, 1, rng)
        fx = cached_fixtures(str(tmp_path), "t2", clean, 20.0, [0, 1, 2])
        r = evaluate(
            [clean], 20.0,
            default_params(20.0, FilterMode.FLT1),
            default_params(20.0, FilterMode.FLT2),
            default_params(20.0, FilterMode.SMO1),
            first_frame=0, border=4, fixtures=[fx],
        )
        assert np.isfinite(r.mse["flt2"]) and r.mse["flt2"] < 400.0


class TestDynamicParams:
    """Traced group-size/beta scalars == the statically-compiled kernels
    (the training harness reuses ONE compiled kernel across all trials)."""

    def test_v2_dyn_equals_static(self, rng):
        from bwd_nlkalman_tpu.core.engine import dense_pass_v2
        from bwd_nlkalman_tpu.params import NLKParams
        from bwd_nlkalman_tpu.train.search import _dyn_split

        h, w = 24, 28
        cur = jnp.asarray(rng.uniform(0, 255, (h, w, 1)).astype(np.float32))
        prev = cur + 4 * jnp.asarray(rng.standard_normal((h, w, 1)).astype(np.float32))
        valid = jnp.ones((h, w), bool)
        p = NLKParams(patch_sz=4, search_sz_x=3, search_sz_t=2,
                      npatches_x=8, npatches_t=6, npatches_tagg=4,
                      dista_lambda=1.0, beta_x=2.5, beta_t=1.5)
        key, dyn = _dyn_split(p)
        a = dense_pass_v2(cur, prev, valid, cur, 10.0, p, "filter", True, False)
        b = dense_pass_v2(cur, prev, valid, cur, 10.0, key, "filter", True,
                          False, dyn=dyn)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_pallas_dyn_equals_static(self, rng):
        from bwd_nlkalman_tpu.core.engine_pallas import dense_pass_pallas
        from bwd_nlkalman_tpu.params import NLKParams
        from bwd_nlkalman_tpu.train.search import _dyn_split

        h, w = 24, 28
        cur = jnp.asarray(rng.uniform(0, 255, (h, w, 1)).astype(np.float32))
        prev = cur + 4 * jnp.asarray(rng.standard_normal((h, w, 1)).astype(np.float32))
        valid = jnp.ones((h, w), bool)
        p = NLKParams(patch_sz=4, search_sz_x=3, search_sz_t=2,
                      npatches_x=8, npatches_t=6, npatches_tagg=4,
                      dista_lambda=1.0, beta_x=2.5, beta_t=1.5)
        key, dyn = _dyn_split(p)
        a = dense_pass_pallas(cur, prev, valid, cur, 10.0, p, "filter",
                              True, False, interpret=True)
        b = dense_pass_pallas(cur, prev, valid, cur, 10.0, key, "filter",
                              True, False, interpret=True, dyn=dyn)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_dynamic_search_no_recompile(self, rng, tmp_path):
        """Two dynamic trials with different group sizes produce the same
        results as two static trials, via the fixtures path."""
        from bwd_nlkalman_tpu.train import cached_fixtures, evaluate
        from bwd_nlkalman_tpu.params import NLKParams, FilterMode, default_params

        clean = _scene(3, 24, 32, 1, rng)
        fx = cached_fixtures(str(tmp_path), "dyn", clean, 20.0, [0, 1, 2])
        p2 = default_params(20.0, FilterMode.FLT2)
        ps = default_params(20.0, FilterMode.SMO1)
        for npx in (6, 12):
            p1 = NLKParams(patch_sz=8, search_sz_x=4, search_sz_t=3,
                           npatches_x=npx, npatches_t=npx, npatches_tagg=4,
                           dista_lambda=1.0, beta_x=3.0, beta_t=2.0)
            r_dyn = evaluate([clean], 20.0, p1, p2, ps, first_frame=0,
                             border=4, fixtures=[fx], dynamic=True)
            r_sta = evaluate([clean], 20.0, p1, p2, ps, first_frame=0,
                             border=4, fixtures=[fx], dynamic=False)
            assert abs(r_dyn.mse["flt2"] - r_sta.mse["flt2"]) < 1e-3


class TestColumnStrips:
    def test_strips_equal_full(self, rng):
        """Column-strip fused pass (halo overlap-add, own-lane gating) ==
        the full-width fused pass, interpret mode."""
        from bwd_nlkalman_tpu.core.engine_pallas import (
            dense_pass_pallas, dense_pass_pallas_xstrips)
        from bwd_nlkalman_tpu.params import NLKParams

        h, w = 24, 72
        prms = NLKParams(patch_sz=4, search_sz_x=3, search_sz_t=2,
                         npatches_x=8, npatches_t=6, npatches_tagg=4,
                         dista_lambda=1.0, beta_x=3.0, beta_t=2.0)
        cur = jnp.asarray(rng.uniform(0, 255, (h, w, 1)).astype(np.float32))
        prev = cur + 4 * jnp.asarray(
            rng.standard_normal((h, w, 1)).astype(np.float32))
        valid = np.ones((h, w), bool)
        valid[8:14, 30:50] = False
        prev_z = jnp.where(jnp.asarray(valid)[..., None], prev, 0.0)

        full = dense_pass_pallas(
            cur, prev_z, jnp.asarray(valid), cur, 15.0, prms, "filter",
            True, False, interpret=True)
        for n in (2, 3):
            strips = dense_pass_pallas_xstrips(
                cur, prev_z, jnp.asarray(valid), cur, 15.0, prms, "filter",
                True, False, n_strips=n, interpret=True)
            np.testing.assert_allclose(
                np.asarray(strips), np.asarray(full), rtol=1e-4, atol=2e-3)

    def test_dispatch_names_strips(self):
        from bwd_nlkalman_tpu.core.engine_pallas import strips_supported
        from bwd_nlkalman_tpu.params import default_params, FilterMode

        p = default_params(20.0, FilterMode.FLT1)
        # 1080p RGB: full width exceeds the budget, 2 strips fit (bf16)
        from bwd_nlkalman_tpu.core.engine_pallas import pallas_pass_supported
        assert not pallas_pass_supported(1080, 1920, 3, p, "filter",
                                         window_dtype="bfloat16")
        assert strips_supported(1080, 1920, 3, p, "filter", 2,
                                window_dtype="bfloat16")


class TestWarmStartFlow:
    def test_fixed_point_stability(self, rng):
        """Re-solving from the cold solution (warm carry) stays at the
        solution: warm flow on the SAME pair ~ cold flow."""
        from bwd_nlkalman_tpu.flow.tvl1 import (
            tvl1_flow, tvl1_flow_warm, flow_carry_shape)

        h, w = 48, 64
        base = np.cumsum(np.cumsum(rng.normal(size=(h + 8, w + 8)), 0), 1)
        base = ((base - base.min()) / (base.max() - base.min()) * 255
                ).astype(np.float32)
        i0 = jnp.asarray(base[4:4 + h, 4:4 + w])
        i1 = jnp.asarray(base[2:2 + h, 5:5 + w])

        kw = dict(fscale=1, nwarps=2, max_iters=40)
        cold, u_fs = tvl1_flow(i0, i1, return_carry=True, **kw)
        assert u_fs.shape == flow_carry_shape(h, w, fscale=1)
        warm, u_fs2 = tvl1_flow_warm(i0, i1, u_fs, **kw)
        assert u_fs2.shape == u_fs.shape
        # the warm solve re-runs nwarps stages from the fixed point; it
        # must not wander off (same minimizer, same parameters)
        err = float(jnp.mean(jnp.abs(warm - cold)))
        assert err < 0.05, err

    def test_warm_sequence_matches_cold_quality(self, rng):
        """filter+smooth with warm_start tracks the cold pipeline's PSNR
        on a translating scene (small shapes, capped iterations)."""
        from bwd_nlkalman_tpu.pipeline.sequence import (
            filter_sequence, smooth_sequence, FlowConfig)

        t, h, w = 5, 48, 64
        clean = _scene(t, h, w, 1, rng)
        sigma = 20.0
        noisy = jnp.asarray(
            clean + sigma * rng.standard_normal(clean.shape).astype(np.float32))

        def psnr(x, ref):
            mse = float(np.mean((np.asarray(x) - ref) ** 2))
            return 20 * np.log10(255 / np.sqrt(mse))

        res = {}
        for ws in (False, True):
            cfg = FlowConfig(warm_start=ws, max_iters=60)
            _, f2 = filter_sequence(noisy, sigma, flow_cfg=cfg)
            s1 = smooth_sequence(f2, sigma, flow_cfg=cfg)
            res[ws] = (psnr(f2[1:], clean[1:]), psnr(s1[:-1], clean[:-1]))
        assert res[True][0] > res[False][0] - 0.15, res
        assert res[True][1] > res[False][1] - 0.15, res

    def test_residual_gate_rejects_stale_carry(self, rng):
        """A wrong-sign carry (motion reversal / scene cut) must trip the
        residual gate: the gated warm flow falls back to the cold
        coarse-to-fine pyramid and equals tvl1_flow exactly."""
        from bwd_nlkalman_tpu.flow.tvl1 import tvl1_flow, tvl1_flow_warm

        h, w = 48, 64
        base = np.cumsum(np.cumsum(rng.normal(size=(h + 16, w + 16)), 0), 1)
        base = ((base - base.min()) / (base.max() - base.min()) * 255
                ).astype(np.float32)
        i0 = jnp.asarray(base[8:8 + h, 8:8 + w])
        i1 = jnp.asarray(base[4:4 + h, 8:8 + w])   # 4 px vertical motion

        kw = dict(fscale=1, nwarps=2, max_iters=40)
        cold, u_fs = tvl1_flow(i0, i1, return_carry=True, **kw)
        stale = -u_fs  # exactly wrong direction
        gated, _ = tvl1_flow_warm(i0, i1, stale, **kw)
        np.testing.assert_array_equal(np.asarray(gated), np.asarray(cold))
        # ungated from the same stale carry is measurably worse
        ungated, _ = tvl1_flow_warm(i0, i1, stale, gate=False, **kw)
        err_g = float(jnp.mean(jnp.abs(gated - cold)))
        err_u = float(jnp.mean(jnp.abs(ungated - cold)))
        assert err_g == 0.0
        assert err_u > 0.1, (err_g, err_u)

    def test_residual_gate_passes_good_carry(self, rng):
        """A fixed-point carry passes the gate: gated == ungated warm."""
        from bwd_nlkalman_tpu.flow.tvl1 import tvl1_flow, tvl1_flow_warm

        h, w = 48, 64
        base = np.cumsum(np.cumsum(rng.normal(size=(h + 8, w + 8)), 0), 1)
        base = ((base - base.min()) / (base.max() - base.min()) * 255
                ).astype(np.float32)
        i0 = jnp.asarray(base[4:4 + h, 4:4 + w])
        i1 = jnp.asarray(base[2:2 + h, 5:5 + w])

        kw = dict(fscale=1, nwarps=2, max_iters=40)
        _, u_fs = tvl1_flow(i0, i1, return_carry=True, **kw)
        gated, _ = tvl1_flow_warm(i0, i1, u_fs, **kw)
        ungated, _ = tvl1_flow_warm(i0, i1, u_fs, gate=False, **kw)
        np.testing.assert_array_equal(np.asarray(gated), np.asarray(ungated))

    def test_warm_sequence_shapes_tiny_t(self, rng):
        """T=2 (empty warm scan) and T=3 paths are well-formed."""
        from bwd_nlkalman_tpu.pipeline.sequence import (
            filter_sequence, smooth_sequence, FlowConfig)

        for t in (2, 3):
            clean = _scene(t, 48, 64, 1, rng)
            noisy = jnp.asarray(
                clean + 10 * rng.standard_normal(clean.shape).astype(np.float32))
            cfg = FlowConfig(warm_start=True, max_iters=8)
            f1, f2 = filter_sequence(noisy, 10.0, flow_cfg=cfg)
            assert f1.shape == noisy.shape and f2.shape == noisy.shape
            s1 = smooth_sequence(f2, 10.0, flow_cfg=cfg)
            assert s1.shape == noisy.shape

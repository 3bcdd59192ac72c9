"""Unit tests for low-level ops against independent numpy/scipy oracles."""

import numpy as np
import pytest
import scipy.fft

import jax.numpy as jnp

from bwd_nlkalman_tpu.ops import (
    rgb2opp,
    opp2rgb,
    window_function,
    dct2_patches,
    idct2_patches,
    dct2_image,
    idct2_image,
    dct_image_all_patches,
    centered_gradient,
    forward_gradient,
    divergence,
    gaussian_blur,
    zoom_out,
    zoom_in,
    zoom_size,
    awgn,
    lcg_knuth_normals,
)
from bwd_nlkalman_tpu.ops.dct import dct2_flat, idct2_flat, patch_dct_matrix_2d
from bwd_nlkalman_tpu.ops.warp import warp_bicubic_nan, bicubic_sample


class TestColor:
    def test_roundtrip(self, rng):
        im = rng.normal(size=(7, 9, 3)).astype(np.float32) * 100
        out = np.asarray(opp2rgb(rgb2opp(jnp.asarray(im))))
        np.testing.assert_allclose(out, im, atol=1e-3)

    def test_matches_reference_formula(self, rng):
        # direct transcription of rgb2opp (src/nlkalman.c:92-110)
        im = rng.normal(size=(4, 5, 3)).astype(np.float32) * 50
        a = 1 / np.sqrt(3.0)
        b = 1 / np.sqrt(2.0)
        c = 2 * a * np.sqrt(2.0)
        r, g, bch = im[..., 0], im[..., 1], im[..., 2]
        want = np.stack(
            [a * (r + g + bch), b * (r - bch), c * (0.25 * r - 0.5 * g + 0.25 * bch)],
            axis=-1,
        )
        got = np.asarray(rgb2opp(jnp.asarray(im)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_gray_identity(self, rng):
        im = rng.normal(size=(4, 5, 1)).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(rgb2opp(jnp.asarray(im))), im)

    def test_noise_preserving(self, rng):
        # the opponent transform is orthogonal: white noise stays white
        n = rng.normal(size=(100, 100, 3)).astype(np.float32)
        t = np.asarray(rgb2opp(jnp.asarray(n)))
        np.testing.assert_allclose(t.std(axis=(0, 1)), 1.0, atol=0.03)


class TestWindow:
    def test_gaussian_window_matches_reference(self):
        # window_function("gaussian", 8), src/nlkalman.c:401-407
        n, n2, s = 8, 3.5, 0.4
        w1 = np.exp(-0.5 * ((np.arange(8) - n2) / n2 / s) ** 2)
        want = np.outer(w1, w1)
        got = np.asarray(window_function("gaussian", 8))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    @pytest.mark.parametrize(
        "kind", ["parzen", "welch", "hanning", "hamming", "blackman", "constant"]
    )
    def test_windows_finite_positive_center(self, kind):
        w = np.asarray(window_function(kind, 8))
        assert np.isfinite(w).all()
        assert w[3, 3] > 0


class TestPatchDCT:
    def test_matches_scipy_ortho(self, rng):
        p = rng.normal(size=(5, 3, 8, 8)).astype(np.float32)
        want = scipy.fft.dctn(p, type=2, norm="ortho", axes=(-2, -1))
        got = np.asarray(dct2_patches(jnp.asarray(p)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_roundtrip(self, rng):
        p = rng.normal(size=(4, 8, 8)).astype(np.float32)
        out = np.asarray(idct2_patches(dct2_patches(jnp.asarray(p))))
        np.testing.assert_allclose(out, p, atol=1e-4)

    def test_flat_matches_2d(self, rng):
        p = rng.normal(size=(6, 64)).astype(np.float32)
        got = np.asarray(dct2_flat(jnp.asarray(p), 8))
        want = np.asarray(dct2_patches(jnp.asarray(p.reshape(6, 8, 8)))).reshape(6, 64)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        back = np.asarray(idct2_flat(jnp.asarray(got), 8))
        np.testing.assert_allclose(back, p, atol=1e-4)

    def test_parseval(self, rng):
        # orthonormality: distances preserved (basis of the DCT-domain search)
        p = rng.normal(size=(10, 64)).astype(np.float32)
        d = np.asarray(dct2_flat(jnp.asarray(p), 8))
        np.testing.assert_allclose(
            (d**2).sum(axis=1), (p**2).sum(axis=1), rtol=1e-4
        )

    def test_basis_orthonormal(self):
        b = np.asarray(patch_dct_matrix_2d(8))
        np.testing.assert_allclose(b @ b.T, np.eye(64), atol=1e-5)


class TestImageDCT:
    def test_matches_multiscaler_normalization(self, rng):
        # forward = scipy dctn type 2 (unnormalized == FFTW) / (4wh)
        im = rng.normal(size=(12, 10, 3)).astype(np.float32)
        want = scipy.fft.dctn(im, type=2, axes=(0, 1)) / (4 * 12 * 10)
        got = np.asarray(dct2_image(jnp.asarray(im)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_roundtrip(self, rng):
        im = rng.normal(size=(16, 9, 1)).astype(np.float32)
        out = np.asarray(idct2_image(dct2_image(jnp.asarray(im))))
        np.testing.assert_allclose(out, im, atol=1e-4)


class TestDCTImageAllPatches:
    def test_matches_per_patch(self, rng):
        im = rng.normal(size=(14, 13, 2)).astype(np.float32)
        got = np.asarray(dct_image_all_patches(jnp.asarray(im), 8))
        assert got.shape == (7, 6, 2 * 64)
        for (y, x) in [(0, 0), (3, 2), (6, 5)]:
            patch = im[y : y + 8, x : x + 8]  # (8,8,C)
            want = scipy.fft.dctn(
                patch.transpose(2, 0, 1), type=2, norm="ortho", axes=(1, 2)
            ).reshape(-1)
            np.testing.assert_allclose(got[y, x], want, rtol=1e-3, atol=1e-4)


class TestGrad:
    def _ref_forward(self, f):
        h, w = f.shape
        fx = np.zeros_like(f)
        fy = np.zeros_like(f)
        fx[:, :-1] = f[:, 1:] - f[:, :-1]
        fy[:-1, :] = f[1:, :] - f[:-1, :]
        return fx, fy

    def _ref_divergence(self, v1, v2):
        # literal transcription of mask.c:43-92
        h, w = v1.shape
        div = np.zeros_like(v1)
        for i in range(h):
            for j in range(w):
                v1x = v1[i, j] - v1[i, j - 1] if j > 0 else v1[i, j]
                if j == w - 1:
                    v1x = -v1[i, j - 1]
                v2y = v2[i, j] - v2[i - 1, j] if i > 0 else v2[i, j]
                if i == h - 1:
                    v2y = -v2[i - 1, j]
                div[i, j] = v1x + v2y
        return div

    def test_forward(self, rng):
        f = rng.normal(size=(6, 7)).astype(np.float32)
        fx, fy = forward_gradient(jnp.asarray(f))
        rfx, rfy = self._ref_forward(f)
        np.testing.assert_allclose(np.asarray(fx), rfx, atol=1e-6)
        np.testing.assert_allclose(np.asarray(fy), rfy, atol=1e-6)

    def test_divergence(self, rng):
        v1 = rng.normal(size=(6, 7)).astype(np.float32)
        v2 = rng.normal(size=(6, 7)).astype(np.float32)
        got = np.asarray(divergence(jnp.asarray(v1), jnp.asarray(v2)))
        np.testing.assert_allclose(got, self._ref_divergence(v1, v2), atol=1e-6)

    def test_adjointness(self, rng):
        # <grad u, p> = -<u, div p> — the discrete duality TV-L1 relies on
        u = rng.normal(size=(8, 9)).astype(np.float64)
        p1 = rng.normal(size=(8, 9)).astype(np.float64)
        p2 = rng.normal(size=(8, 9)).astype(np.float64)
        ux, uy = forward_gradient(jnp.asarray(u))
        div = divergence(jnp.asarray(p1), jnp.asarray(p2))
        lhs = float((np.asarray(ux) * p1 + np.asarray(uy) * p2).sum())
        rhs = float(-(u * np.asarray(div)).sum())
        # jax runs in f32 by default; identity is exact in exact arithmetic
        assert abs(lhs - rhs) < 1e-4 * max(1, abs(lhs))

    def test_centered(self, rng):
        f = rng.normal(size=(5, 6)).astype(np.float32)
        dx, dy = centered_gradient(jnp.asarray(f))
        # interior formula
        np.testing.assert_allclose(
            np.asarray(dx)[1:-1, 1:-1], 0.5 * (f[1:-1, 2:] - f[1:-1, :-2]), atol=1e-6
        )
        # border: one-sided halves (mask.c:185-195)
        np.testing.assert_allclose(
            np.asarray(dx)[:, 0], 0.5 * (f[:, 1] - f[:, 0]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(dy)[0, :], 0.5 * (f[1, :] - f[0, :]), atol=1e-6
        )


class TestGaussian:
    def _ref_gaussian(self, img, sigma):
        """Literal transcription of mask.c:217-333 in numpy (float64 accum)."""
        img = img.astype(np.float64).copy()
        size = int(5 * sigma) + 1
        i = np.arange(size)
        b = np.exp(-i * i / (2.0 * sigma**2)) / (sigma * np.sqrt(2 * np.pi))
        b /= 2 * b.sum() - b[0]

        def conv_rows(a):
            h, w = a.shape
            out = np.empty_like(a)
            for k in range(h):
                r = np.empty(w + 2 * size)
                r[size : size + w] = a[k]
                for t in range(size):
                    r[t] = a[k, size - t]          # left: reflect, no edge
                    r[size + w + t] = a[k, w - t - 1]  # right: edge kept
                for t in range(w):
                    s = b[0] * r[size + t]
                    for j in range(1, size):
                        s += b[j] * (r[size + t - j] + r[size + t + j])
                    out[k, t] = s
            return out

        img = conv_rows(img)
        img = conv_rows(img.T).T
        return img

    def test_matches_reference(self, rng):
        img = (rng.normal(size=(12, 15)) * 50 + 100).astype(np.float32)
        for sigma in [0.8, 1.0392304845413263]:  # presmooth & zoom sigmas
            want = self._ref_gaussian(img, sigma)
            got = np.asarray(gaussian_blur(jnp.asarray(img), sigma))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


class TestZoom:
    def test_zoom_size(self):
        assert zoom_size(960, 540, 0.5) == (480, 270)
        assert zoom_size(11, 7, 0.5) == (6, 4)

    def test_zoom_out_shape_and_smooth(self, rng):
        img = (rng.normal(size=(24, 32)) * 10 + 128).astype(np.float32)
        out = np.asarray(zoom_out(jnp.asarray(img), 0.5))
        assert out.shape == (12, 16)
        # downsampling a constant image stays constant
        const = jnp.full((24, 32), 42.0, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(zoom_out(const, 0.5)), 42.0, atol=1e-3)

    def test_zoom_in_shape(self, rng):
        img = (rng.normal(size=(12, 16)) * 10).astype(np.float32)
        out = np.asarray(zoom_in(jnp.asarray(img), 32, 24))
        assert out.shape == (24, 32)


class TestWarp:
    def test_zero_flow_identity_interior(self, rng):
        im = rng.normal(size=(10, 12, 2)).astype(np.float32)
        flow = np.zeros((10, 12, 2), dtype=np.float32)
        warped, valid = warp_bicubic_nan(jnp.asarray(im), jnp.asarray(flow))
        warped, valid = np.asarray(warped), np.asarray(valid)
        # interior pixels exactly reproduced (cubic interp at integer = v[1])
        np.testing.assert_allclose(warped[2:-2, 2:-2], im[2:-2, 2:-2], atol=1e-5)
        # border ring invalid (taps outside frame -> NaN in the reference)
        assert not valid[0].any() and not valid[-1].any()
        assert not valid[:, 0].any() and not valid[:, -1].any()
        assert valid[2:-2, 2:-2].all()

    def test_validity_frontier_matches_reference_rule(self):
        # valid iff floor(x + u - 1) >= 0 and floor(x + u - 1) + 3 <= w-1
        im = jnp.ones((8, 8, 1), dtype=jnp.float32)
        flow = np.zeros((8, 8, 2), dtype=np.float32)
        flow[:, :, 0] = 1.0  # shift +1: x=0 samples source x=1 => ix=0 valid
        _, valid = warp_bicubic_nan(im, jnp.asarray(flow))
        v = np.asarray(valid)
        assert v[3, 0]  # x + u - 1 = 0 -> taps 0..3 in range
        assert not v[3, 5]  # x=5: xs=5, taps 5..8 out of range (w=8)

    def test_occlusion_mask(self, rng):
        im = rng.normal(size=(10, 10, 1)).astype(np.float32)
        flow = np.zeros((10, 10, 2), dtype=np.float32)
        occ = np.zeros((10, 10), dtype=np.float32)
        occ[5, 5] = 255.0
        _, valid = warp_bicubic_nan(jnp.asarray(im), jnp.asarray(flow), jnp.asarray(occ))
        v = np.asarray(valid)
        assert not v[5, 5]
        assert v[4, 4]

    def test_subpixel_linear_ramp(self):
        # cubic interpolation reproduces linear functions exactly
        h, w = 12, 12
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        im = (3.0 * xx + 2.0 * yy)[..., None]
        flow = np.full((h, w, 2), 0.25, dtype=np.float32)
        warped, valid = warp_bicubic_nan(jnp.asarray(im), jnp.asarray(flow))
        want = 3.0 * (xx + 0.25) + 2.0 * (yy + 0.25)
        m = np.asarray(valid)
        np.testing.assert_allclose(
            np.asarray(warped)[..., 0][m], want[m], rtol=1e-5, atol=1e-4
        )

    def test_bicubic_sample_truncation_negative(self):
        # reference truncates toward zero and uses a sign trick; a linear
        # ramp must still be interpolated exactly for small negative coords
        h, w = 8, 8
        im = jnp.asarray(np.tile(np.arange(w, dtype=np.float32), (h, 1)))
        uu = jnp.asarray(np.full((3,), 2.5, dtype=np.float32))
        vv = jnp.asarray(np.full((3,), 3.0, dtype=np.float32))
        out = np.asarray(bicubic_sample(im, uu, vv, border_out=False))
        np.testing.assert_allclose(out, 2.5, atol=1e-5)


class TestNoise:
    def test_lcg_first_values(self):
        # first states of the Knuth LCG, computed independently
        a, c = 6364136223846793005, 1442695040888963407
        s = 42
        want = []
        for _ in range(5):
            s = (a * s + c) % (1 << 64)
            want.append(s >> 32)
        states = lcg_knuth_normals  # silence lint
        from bwd_nlkalman_tpu.ops.noise import lcg_knuth_states

        got = [int(x) >> 32 for x in lcg_knuth_states(42, 5)]
        assert got == want

    def test_binary_lifting_matches_sequential(self):
        from bwd_nlkalman_tpu.ops.noise import lcg_knuth_states

        a, c = 6364136223846793005, 1442695040888963407
        s = 12345
        seq = []
        for _ in range(1000):
            s = (a * s + c) % (1 << 64)
            seq.append(s)
        got = lcg_knuth_states(12345, 1000)
        assert [int(x) for x in got] == seq

    def test_awgn_statistics(self, rng):
        img = np.zeros((64, 64, 3), dtype=np.float32)
        noisy = awgn(img, 20.0, seed=7)
        assert abs(noisy.std() - 20.0) < 0.5
        assert abs(noisy.mean()) < 0.5

    def test_awgn_deterministic(self):
        img = np.ones((8, 8, 1), dtype=np.float32)
        a = awgn(img, 10.0, seed=3)
        b = awgn(img, 10.0, seed=3)
        np.testing.assert_array_equal(a, b)
        cdiff = awgn(img, 10.0, seed=4)
        assert not np.array_equal(a, cdiff)

"""Pyramid op parity with the C decompose/recompose binaries + multiscale
pipeline quality gate."""

import os
import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

from bwd_nlkalman_tpu.ops.pyramid import (
    dct_decompose, dct_recompose, pyramid_sizes,
    lanczos3_down, lanczos3_up, lanczos3_decompose, lanczos3_recompose,
)
from bwd_nlkalman_tpu.io import write_tiff, read_tiff
from bwd_nlkalman_tpu.pipeline import add_noise_sequence, sequence_psnr
from bwd_nlkalman_tpu.pipeline.multiscale import ms_denoise_sequence
from test_pipeline import make_sequence

REFBIN = os.environ.get("BNLK_REFBIN", "/tmp/refbuild/bin")
has_ref = os.path.exists(os.path.join(REFBIN, "decompose"))


def test_decompose_recompose_roundtrip(rng):
    img = jnp.asarray(rng.standard_normal((48, 64, 1)).astype(np.float32) * 50)
    lv = dct_decompose(img, 3)
    assert [x.shape[:2] for x in lv] == [(48, 64), (24, 32), (12, 16)]
    # recompose with factor 0 keeps level 0 exactly
    rec = dct_recompose(lv, 0.0)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(img), atol=1e-3)


def test_pyramid_sizes_truncation():
    assert pyramid_sizes(45, 63, 3) == [(45, 63), (22, 31), (11, 15)]


@pytest.mark.skipif(not has_ref, reason="reference binaries not built")
def test_decompose_matches_c(tmp_path, rng):
    img = rng.standard_normal((40, 56, 1)).astype(np.float32) * 60 + 100
    src = str(tmp_path / "in.tif")
    write_tiff(src, img)
    subprocess.run(
        [os.path.join(REFBIN, "decompose"), src, str(tmp_path / "lv"), "3", "-x.tif"],
        check=True, capture_output=True,
    )
    mine = dct_decompose(jnp.asarray(img), 3)
    for i in range(3):
        c_lv = read_tiff(str(tmp_path / f"lv{i}-x.tif"))
        np.testing.assert_allclose(np.asarray(mine[i]), c_lv, rtol=2e-4, atol=2e-3)


@pytest.mark.skipif(not has_ref, reason="reference binaries not built")
def test_recompose_matches_c(tmp_path, rng):
    img = rng.standard_normal((40, 56, 1)).astype(np.float32) * 60 + 100
    lv = dct_decompose(jnp.asarray(img), 3)
    # perturb the levels so recompose actually merges
    lv = [x + float(i) for i, x in enumerate(lv)]
    for i, x in enumerate(lv):
        write_tiff(str(tmp_path / f"lv{i}-x.tif"), np.asarray(x))
    outp = str(tmp_path / "rec.tif")
    subprocess.run(
        [os.path.join(REFBIN, "recompose"), str(tmp_path / "lv"), "3", "-x.tif",
         outp, "-c", "0.7"],
        check=True, capture_output=True,
    )
    c_rec = read_tiff(outp)
    mine = dct_recompose(lv, 0.7)
    np.testing.assert_allclose(np.asarray(mine), c_rec, rtol=2e-4, atol=5e-3)


def test_lanczos3_roundtrip(rng):
    img = jnp.asarray(rng.standard_normal((32, 32)).astype(np.float32))
    d = lanczos3_down(img)
    assert d.shape == (16, 16)
    u = lanczos3_up(d, 32, 32)
    assert u.shape == (32, 32)
    lv = lanczos3_decompose(img, 3)
    rec = lanczos3_recompose(lv)
    assert rec.shape == img.shape
    # recompose must at least preserve the coarse content scale
    assert float(jnp.abs(jnp.mean(rec) - jnp.mean(img))) < 0.5


def test_ms_pipeline_denoises():
    rng = np.random.default_rng(5)
    clean = make_sequence(rng, t=4, h=64, w=64)
    sigma = 20.0
    noisy = add_noise_sequence(clean, sigma, seeds=[7 + i for i in range(4)])
    flt1, flt2, smo1 = ms_denoise_sequence(jnp.asarray(noisy), sigma, levels=2)
    mn = sequence_psnr(clean, noisy)["psnr"]
    m2 = sequence_psnr(clean, np.asarray(flt2))["psnr"]
    ms = sequence_psnr(clean, np.asarray(smo1))["psnr"]
    assert m2 > mn + 5
    assert ms >= m2 - 0.2

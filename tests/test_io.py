"""Codec round-trips plus cross-validation against the reference's iio
(binaries built by tools/build_reference.sh, skipped when absent)."""

import os
import subprocess

import numpy as np
import pytest

from bwd_nlkalman_tpu.io import (
    read_flo, write_flo, read_pfm, write_pfm, read_png, write_png,
    read_tiff, write_tiff, read_video, write_video,
)

REFBIN = os.environ.get("BNLK_REFBIN", "/tmp/refbuild/bin")
has_ref = os.path.exists(os.path.join(REFBIN, "iion"))


def test_pfm_roundtrip(tmp_path, rng):
    for c in (1, 3):
        img = rng.standard_normal((17, 23, c)).astype(np.float32) * 100
        p = str(tmp_path / f"a{c}.pfm")
        write_pfm(p, img)
        np.testing.assert_array_equal(read_pfm(p), img)


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.standard_normal((11, 13, 2)).astype(np.float32) * 5
    p = str(tmp_path / "f.flo")
    write_flo(p, flow)
    np.testing.assert_array_equal(read_flo(p), flow)


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_png_roundtrip_8bit(tmp_path, rng, c):
    img = rng.integers(0, 256, (9, 14, c)).astype(np.uint8)
    p = str(tmp_path / f"p{c}.png")
    write_png(p, img.astype(np.float32))
    np.testing.assert_array_equal(read_png(p), img.astype(np.float32))


def test_png_roundtrip_16bit(tmp_path, rng):
    img = rng.integers(0, 65536, (7, 9, 1)).astype(np.uint16)
    p = str(tmp_path / "p16.png")
    write_png(p, img)
    np.testing.assert_array_equal(read_png(p), img.astype(np.float32))


def test_tiff_roundtrip_float(tmp_path, rng):
    for c in (1, 3):
        img = rng.standard_normal((12, 19, c)).astype(np.float32) * 50
        p = str(tmp_path / f"t{c}.tif")
        write_tiff(p, img)
        np.testing.assert_array_equal(read_tiff(p), img)


def test_video_pattern(tmp_path, rng):
    vid = rng.standard_normal((4, 8, 9, 1)).astype(np.float32)
    pat = str(tmp_path / "fr-%03d.tif")
    write_video(pat, vid, first=3)
    got = read_video(pat, 3, 6)
    np.testing.assert_array_equal(got, vid)


# ---- cross-validation with the reference iio ------------------------------


@pytest.mark.skipif(not has_ref, reason="reference binaries not built")
def test_iio_reads_our_tiff(tmp_path, rng):
    """iio (via iion) must read our float TIFF bit-exactly (-> PFM)."""
    img = rng.standard_normal((10, 15, 1)).astype(np.float32) * 80
    tif = str(tmp_path / "x.tif")
    pfm = str(tmp_path / "x.pfm")
    write_tiff(tif, img)
    subprocess.run([os.path.join(REFBIN, "iion"), tif, pfm], check=True)
    np.testing.assert_allclose(read_pfm(pfm), img, atol=0)


@pytest.mark.skipif(not has_ref, reason="reference binaries not built")
def test_we_read_iio_tiff(tmp_path, rng):
    """We must read iio-written float TIFFs bit-exactly."""
    img = rng.standard_normal((10, 15, 1)).astype(np.float32) * 80
    pfm = str(tmp_path / "y.pfm")
    tif = str(tmp_path / "y.tif")
    write_pfm(pfm, img)
    subprocess.run([os.path.join(REFBIN, "iion"), pfm, tif], check=True)
    np.testing.assert_allclose(read_tiff(tif), img, atol=0)


@pytest.mark.skipif(not has_ref, reason="reference binaries not built")
def test_iio_reads_our_png(tmp_path, rng):
    img = rng.integers(0, 256, (10, 15, 3)).astype(np.float32)
    png = str(tmp_path / "z.png")
    pfm = str(tmp_path / "z.pfm")
    write_png(png, img)
    subprocess.run([os.path.join(REFBIN, "iion"), png, pfm], check=True)
    np.testing.assert_allclose(read_pfm(pfm), img, atol=0)


@pytest.mark.skipif(
    not __import__("bwd_nlkalman_tpu.native", fromlist=["available"]).available(),
    reason="native io not built",
)
def test_jpeg_roundtrip(tmp_path, rng):
    """JPEG via the native layer (iio's I_CAN_HAS_LIBJPEG, iio.c:30)."""
    from bwd_nlkalman_tpu.io import read_image, write_image

    img = np.clip(
        np.cumsum(rng.standard_normal((24, 32, 1)), 1) * 4 + 128, 0, 255
    ).astype(np.float32)
    p = str(tmp_path / "a.jpg")
    write_image(p, img)
    back = read_image(p)
    assert back.shape == img.shape
    assert np.abs(back - img).mean() < 4.0  # lossy but close at q=95


@pytest.mark.skipif(not has_ref, reason="reference binaries not built")
@pytest.mark.skipif(
    not __import__("bwd_nlkalman_tpu.native", fromlist=["available"]).available(),
    reason="native io not built",
)
def test_iio_cross_reads_our_jpeg(tmp_path, rng):
    """iio must decode our JPEG to the same samples we decode."""
    from bwd_nlkalman_tpu.io import read_image, write_image

    img = np.clip(
        np.cumsum(rng.standard_normal((16, 20, 3)), 1) * 6 + 128, 0, 255
    ).astype(np.float32)
    jp = str(tmp_path / "b.jpg")
    tif = str(tmp_path / "b.tif")
    write_image(jp, img)
    subprocess.run([os.path.join(REFBIN, "iion"), jp, tif], check=True)
    np.testing.assert_allclose(read_image(tif), read_image(jp), atol=0)

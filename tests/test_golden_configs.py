"""Golden tests mirroring the driver's BASELINE.json eval configs:

3. RGB sequence, two-iteration filtering, auto sigma params, occlusions
4. filtering + RTS smoothing at sigma=40 (full bidirectional pipeline)

Both compare end-to-end PSNR against the C nlkalman-seq.sh on identical
noisy input (skipped when the reference isn't built)."""

import os
import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from bwd_nlkalman_tpu.pipeline import (
    add_noise_sequence, denoise_sequence, sequence_psnr,
)
from bwd_nlkalman_tpu.io import write_tiff, read_tiff
from test_pipeline import make_sequence

REFBIN = os.environ.get("BNLK_REFBIN", "/tmp/refbuild/bin")
has_ref = os.path.exists(os.path.join(REFBIN, "nlkalman-seq.sh"))


def _run_c_pipeline(noisy, sigma, tmp_path):
    t = noisy.shape[0]
    pat = str(tmp_path / "n-%03d.tif")
    for i in range(t):
        write_tiff(pat % (i + 1), noisy[i])
    out = tmp_path / "out"
    subprocess.run(
        ["bash", os.path.join(REFBIN, "nlkalman-seq.sh"),
         pat, "1", str(t), str(sigma), str(out)],
        capture_output=True, text=True,
    )
    assert (out / f"smo1-{t:03d}.tif").exists()
    flt2 = np.stack([read_tiff(str(out / f"flt2-{i+1:03d}.tif")) for i in range(t)])
    smo1 = np.stack([read_tiff(str(out / f"smo1-{i+1:03d}.tif")) for i in range(t)])
    return flt2, smo1


@pytest.mark.skipif(not has_ref, reason="reference binaries not built")
def test_rgb_pipeline_vs_c(tmp_path):
    """BASELINE config 3: RGB two-pass filtering with auto params."""
    rng = np.random.default_rng(21)
    clean = make_sequence(rng, t=4, h=64, w=72, c=3)
    # decorrelate channels a little so OPP actually matters
    clean[..., 1] = 0.7 * clean[..., 1] + 30
    clean[..., 2] = 0.5 * clean[..., 2] + 60
    sigma = 20.0
    noisy = add_noise_sequence(clean, sigma, seeds=[31 + i for i in range(4)])
    c_flt2, c_smo1 = _run_c_pipeline(noisy, sigma, tmp_path)
    flt1, flt2, smo1 = denoise_sequence(jnp.asarray(noisy), sigma)
    p_c = sequence_psnr(clean, c_flt2)["psnr"]
    p_j = sequence_psnr(clean, np.asarray(flt2))["psnr"]
    p_cs = sequence_psnr(clean, c_smo1)["psnr"]
    p_js = sequence_psnr(clean, np.asarray(smo1))["psnr"]
    print(f"RGB flt2: C {p_c:.2f} vs jax {p_j:.2f}; smo1: C {p_cs:.2f} vs jax {p_js:.2f}")
    assert p_j > p_c - 0.05, f"flt2 parity: C {p_c:.3f} vs jax {p_j:.3f}"
    assert p_js > p_cs - 0.05, f"smo1 parity: C {p_cs:.3f} vs jax {p_js:.3f}"


@pytest.mark.skipif(not has_ref, reason="reference binaries not built")
def test_sigma40_pipeline_vs_c(tmp_path):
    """BASELINE config 4: full bidirectional pipeline at sigma=40."""
    rng = np.random.default_rng(22)
    clean = make_sequence(rng, t=4, h=64, w=72)
    sigma = 40.0
    noisy = add_noise_sequence(clean, sigma, seeds=[41 + i for i in range(4)])
    c_flt2, c_smo1 = _run_c_pipeline(noisy, sigma, tmp_path)
    flt1, flt2, smo1 = denoise_sequence(jnp.asarray(noisy), sigma)
    p_c = sequence_psnr(clean, c_flt2)["psnr"]
    p_j = sequence_psnr(clean, np.asarray(flt2))["psnr"]
    p_cs = sequence_psnr(clean, c_smo1)["psnr"]
    p_js = sequence_psnr(clean, np.asarray(smo1))["psnr"]
    print(f"s40 flt2: C {p_c:.2f} vs jax {p_j:.2f}; smo1: C {p_cs:.2f} vs jax {p_js:.2f}")
    assert p_j > p_c - 0.05, f"flt2 parity: C {p_c:.3f} vs jax {p_j:.3f}"
    assert p_js > p_cs - 0.05, f"smo1 parity: C {p_cs:.3f} vs jax {p_js:.3f}"

"""CLI-level tests: flag parity with the C binaries and pipeline smoke."""

import os
import subprocess

import numpy as np
import pytest

from bwd_nlkalman_tpu.cli import (  # noqa: F401  (import check)
    nlkalman_flt, nlkalman_smo, tvl1flow, nlkalman_seq, awgn as awgn_cli,
    psnr as psnr_cli, decompose as dec_cli, recompose as rec_cli,
)
from bwd_nlkalman_tpu.io import read_pfm, write_pfm, read_tiff, write_tiff, read_flo

REFBIN = os.environ.get("BNLK_REFBIN", "/tmp/refbuild/bin")
has_ref = os.path.exists(os.path.join(REFBIN, "nlkalman-flt"))


def _noisy(rng, h=32, w=40):
    clean = 100 + 60 * np.outer(
        np.cos(0.15 * np.arange(h)), np.sin(0.2 * np.arange(w))
    )
    return (clean[..., None] + 20 * rng.standard_normal((h, w, 1))).astype(np.float32)


@pytest.mark.skipif(not has_ref, reason="reference binaries not built")
def test_flt_cli_matches_c(tmp_path, rng):
    n = _noisy(rng)
    src = str(tmp_path / "n.pfm")
    write_pfm(src, n)
    flags = ["-s", "20", "--f1_sx", "6", "--f1_st", "3", "--f1_nx", "12",
             "--f1_nt", "8", "--f1_nt_agg", "4", "--f1_bx", "3.0",
             "--f1_bt", "2.0", "--f2_p", "0"]
    subprocess.run(
        [os.path.join(REFBIN, "nlkalman-flt"), "-i", src, *flags,
         "--flt11", str(tmp_path / "c.pfm")],
        check=True, capture_output=True, env={"OMP_NUM_THREADS": "1", "PATH": "/usr/bin:/bin"},
    )
    rc = nlkalman_flt.main(["-i", src, *flags, "--flt11", str(tmp_path / "j.pfm")])
    assert rc == 0
    c = read_pfm(str(tmp_path / "c.pfm"))
    j = read_pfm(str(tmp_path / "j.pfm"))
    # identical semantics up to the documented mask-skip deviation
    assert np.sqrt(np.mean((c - j) ** 2)) < 1.0


def test_tvl1flow_cli(tmp_path, rng):
    a = _noisy(rng, 48, 48)
    b = np.roll(a, 2, axis=1)
    write_pfm(str(tmp_path / "a.pfm"), a)
    write_pfm(str(tmp_path / "b.pfm"), b)
    rc = tvl1flow.main([str(tmp_path / "a.pfm"), str(tmp_path / "b.pfm"),
                        str(tmp_path / "f.flo"), "1"])
    assert rc == 0
    u = read_flo(str(tmp_path / "f.flo"))
    assert u.shape == (48, 48, 2)


def test_awgn_psnr_cli(tmp_path, rng, capsys):
    img = _noisy(rng)
    write_tiff(str(tmp_path / "c.tif"), img)
    assert awgn_cli.main(["10", str(tmp_path / "c.tif"), str(tmp_path / "n.tif"),
                          "--seed", "7"]) == 0
    assert psnr_cli.main([str(tmp_path / "c.tif"), str(tmp_path / "n.tif")]) == 0
    out = capsys.readouterr().out
    psnr_val = float(out.splitlines()[1].split()[1])
    assert 27.0 < psnr_val < 29.0  # sigma=10 -> ~28.1 dB


def test_decompose_recompose_cli(tmp_path, rng):
    img = _noisy(rng, 40, 48)
    write_tiff(str(tmp_path / "i.tif"), img)
    assert dec_cli.main([str(tmp_path / "i.tif"), str(tmp_path / "lv"), "2", "-x.tif"]) == 0
    assert rec_cli.main([str(tmp_path / "lv"), "2", "-x.tif",
                         str(tmp_path / "r.tif"), "-c", "0.0"]) == 0
    rec = read_tiff(str(tmp_path / "r.tif"))
    np.testing.assert_allclose(rec, img, atol=1e-2)


def test_seq_cli_gt_mode(tmp_path, rng, capsys):
    from test_pipeline import make_sequence

    clean = make_sequence(np.random.default_rng(3), t=3, h=48, w=48)
    pat = str(tmp_path / "c-%03d.tif")
    for i in range(3):
        write_tiff(pat % (i + 1), clean[i])
    # packed OPM string like nlkalman-seq.sh:12 (same values as the
    # defaults, so the compiled configs are shared with other tests)
    rc = nlkalman_seq.main([pat, "1", "3", "20", str(tmp_path / "out"),
                            "--gt-pattern", pat, "--seed", "5",
                            "--opm", "1 0.25 0.75 1 0.25 0.75"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "PSNR(dB):" in out
    assert (tmp_path / "out" / "measures").exists()
    assert (tmp_path / "out" / "smo1-003.tif").exists()


@pytest.mark.skipif(not has_ref, reason="reference binaries not built")
def test_smo_cli_matches_c(tmp_path, rng):
    """nlkalman-smo CLI vs the C binary (flow-less smoothing)."""
    from bwd_nlkalman_tpu.cli import nlkalman_smo

    f1 = _noisy(rng)
    s0 = f1 + 3 * rng.standard_normal(f1.shape).astype(np.float32)
    write_pfm(str(tmp_path / "f1.pfm"), f1)
    write_pfm(str(tmp_path / "s0.pfm"), s0)
    flags = ["-s", "20", "--s1_st", "3", "--s1_nt", "8", "--s1_nt_agg", "8",
             "--s1_bt", "4.0"]
    subprocess.run(
        [os.path.join(REFBIN, "nlkalman-smo"),
         "--flt1", str(tmp_path / "f1.pfm"), "--smo0", str(tmp_path / "s0.pfm"),
         *flags, "--smo1", str(tmp_path / "c.pfm")],
        capture_output=True, env={"OMP_NUM_THREADS": "1", "PATH": "/usr/bin:/bin"},
    )
    rc = nlkalman_smo.main(
        ["--flt1", str(tmp_path / "f1.pfm"), "--smo0", str(tmp_path / "s0.pfm"),
         *flags, "--smo1", str(tmp_path / "j.pfm")]
    )
    assert rc == 0
    c = read_pfm(str(tmp_path / "c.pfm"))
    j = read_pfm(str(tmp_path / "j.pfm"))
    assert np.sqrt(np.mean((c - j) ** 2)) < 1.0

"""Round-2 feature tests: lz3 multiscale pipeline, smoother CLI modes,
GD/2-D parameter searches, iion converter, CLI input validation."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from bwd_nlkalman_tpu.io import read_image, write_image


def _clean_seq(rng, t=3, h=48, w=56, ch=1):
    base = rng.uniform(40, 215, (h + 16, w + 16)).astype(np.float32)
    try:
        import scipy.ndimage as ndi

        base = ndi.gaussian_filter(base, 2.0) * 2.2
    except Exception:
        pass
    frames = [
        base[2 * i : 2 * i + h, i : i + w][..., None].repeat(ch, -1)
        for i in range(t)
    ]
    return np.clip(np.stack(frames), 0, 255).astype(np.float32)


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10 * np.log10(255.0 ** 2 / mse)


def test_lz3_pipeline_quality(rng):
    """msnlkalman-lz3-seq equivalent improves PSNR over the noisy input
    (scripts/msnlkalman-lz3-seq.sh semantics: lz3 pyramid, per-frame
    re-decomposition, Laplacian recompose)."""
    from bwd_nlkalman_tpu.pipeline.multiscale import ms_denoise_sequence

    sigma = 20.0
    clean = _clean_seq(rng)
    noisy = clean + sigma * rng.standard_normal(clean.shape).astype(np.float32)
    flt1, flt2, smo1 = ms_denoise_sequence(
        jnp.asarray(noisy), sigma, levels=2, pyramid="lz3"
    )
    p_noisy = _psnr(clean, noisy)
    p_flt2 = _psnr(clean, np.asarray(flt2))
    p_smo1 = _psnr(clean, np.asarray(smo1))
    assert p_flt2 > p_noisy + 3.0
    assert p_smo1 > p_noisy + 3.0
    assert flt2.shape == clean.shape and smo1.shape == clean.shape


def test_gd_and_2d_search(rng):
    """gradient_descent / grid_search_2d smoke (train-gd-smoothing.sh,
    2d-search-filtering-oflow.sh analogues): run, log the 16-col table,
    and move the betas."""
    from bwd_nlkalman_tpu.train import gradient_descent, grid_search_2d

    clean = _clean_seq(rng, t=3, h=40, w=48)
    seqs = [clean]
    hist, betas = gradient_descent(
        seqs, 20.0, fields=("s1_bt",), n_iters=1, step=0.05, gs=0.5,
        first_frame=1,
    )
    assert len(hist) == 1 and "s1_bt" in betas
    assert np.isfinite(betas["s1_bt"])

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        table = os.path.join(td, "table")
        res = grid_search_2d(
            seqs, 20.0, "f1_bx", [3.0], "s1_bt", [4.0, 6.0],
            objective="smo1", first_frame=1, table_path=table,
        )
        assert len(res) == 2
        assert res[0][1].mse["smo1"] <= res[1][1].mse["smo1"]
        rows = open(table).read().strip().splitlines()
        assert len(rows) == 2 and len(rows[0].split()) == 16


def test_iion_roundtrip(tmp_path, rng):
    """iion CLI: format conversion by extension (iion.c:7-24)."""
    from bwd_nlkalman_tpu.cli.iion import main as iion_main

    img = rng.uniform(0, 255, (16, 20, 3)).astype(np.float32)
    tif = str(tmp_path / "a.tif")
    png = str(tmp_path / "a.png")
    write_image(tif, img)
    assert iion_main([tif, png]) == 0
    back = read_image(png)
    assert back.shape == img.shape
    np.testing.assert_allclose(back, np.clip(np.round(img), 0, 255), atol=0.5)


def test_imprintf_extended_directives(rng):
    """Percentiles/rms/sum/distinct (imprintf.c:19-40,496-509).  The C
    binary's -ffast-math reciprocal can land one sorted index low, so
    values are checked against the exact formula."""
    from bwd_nlkalman_tpu.utils.imprintf import imprintf

    x = rng.uniform(0, 255, (16, 20, 1)).astype(np.float32)
    srt = np.sort(x.ravel())
    n = srt.size
    out = imprintf("%q[0] %q[25] %q[100] %r %s %k %y %Y %w %h %c", x).split()
    assert float(out[0]) == pytest.approx(srt[0], rel=1e-5)
    assert float(out[1]) == pytest.approx(srt[(n - 1) * 25 // 100], rel=1e-5)
    assert float(out[2]) == pytest.approx(srt[-1], rel=1e-5)
    assert float(out[3]) == pytest.approx(np.sqrt(np.mean(x ** 2)), rel=1e-4)
    assert float(out[4]) == pytest.approx(x.sum(), rel=1e-4)
    assert out[5] == str(np.unique(x).size)
    assert out[6] == "0" and out[7] == "0"
    assert out[8] == "20" and out[9] == "16" and out[10] == "1"


def test_plambda_magic_stats(rng):
    """Magic statistic suffixes (plambda.c eval_magicvar:1276-1330); the
    C binary cannot evaluate these at all when built with OpenMP, so the
    oracle is the documented formula."""
    from bwd_nlkalman_tpu.utils.plambda import plambda

    x = rng.uniform(0, 255, (12, 14, 1)).astype(np.float32)
    got = plambda("x x%v -", x)
    np.testing.assert_allclose(got, x - x.mean(), rtol=1e-5)
    got = plambda("x%s", x)
    np.testing.assert_allclose(got[0, 0, 0], x.sum(), rtol=1e-5)
    got = plambda("x%r", x)
    np.testing.assert_allclose(got[0, 0, 0], x.std(), rtol=1e-4)
    flat = np.sort(x.ravel())
    qpos = int(np.clip(round(25 * flat.size / 100.0), 0, flat.size - 1))
    got = plambda("x%q25", x)
    np.testing.assert_allclose(got[0, 0, 0], flat[qpos], rtol=1e-5)


def test_view_results_on_reference_table():
    """view_results analogue recovers the reference table's historical
    bests (scripts/dev-scripts/table-df; PSNRs documented in SURVEY §6)."""
    import os

    from bwd_nlkalman_tpu.train.view_results import (
        load_table, best_rows, ascii_landscape,
    )

    src = "/root/reference/scripts/dev-scripts/table-df"
    if not os.path.exists(src):
        pytest.skip("reference table not mounted")
    t = load_table(src)
    assert t.shape[0] > 10000
    bests = {sig: psnr for sig, _, psnr in best_rows(t, "s1_mse")}
    assert bests[10.0] == pytest.approx(35.97, abs=0.01)
    assert bests[20.0] == pytest.approx(32.50, abs=0.01)
    assert bests[40.0] == pytest.approx(29.11, abs=0.01)
    art = ascii_landscape(t, "f1_nx", "f1_bx", "f1_mse", sigma=20.0, bins=8)
    assert "f1_mse" in art and len(art.splitlines()) >= 9


def test_cli_size_validation(tmp_path):
    """nlkalman-flt hard-fails on geometry mismatches like the C binary
    (src/main-flt.c:233-261)."""
    from bwd_nlkalman_tpu.cli.nlkalman_flt import main as flt_main

    nisy = str(tmp_path / "n.png")
    flow = str(tmp_path / "f.flo")
    small = str(tmp_path / "s.png")
    write_image(nisy, np.zeros((24, 32, 1), np.float32))
    write_image(flow, np.zeros((24, 32, 2), np.float32))
    write_image(small, np.zeros((16, 16, 1), np.float32))
    with pytest.raises(SystemExit) as e:
        flt_main(["-i", nisy, "-s", "20", "-o", flow, "--flt10", small,
                  "--flt11", str(tmp_path / "o1.tif"),
                  "--flt21", str(tmp_path / "o2.tif")])
    assert e.value.code == 1
    # flow with wrong size also fails
    badflow = str(tmp_path / "bad.flo")
    write_image(badflow, np.zeros((16, 16, 2), np.float32))
    with pytest.raises(SystemExit) as e:
        flt_main(["-i", nisy, "-s", "20", "-o", badflow,
                  "--flt11", str(tmp_path / "o1.tif"),
                  "--flt21", str(tmp_path / "o2.tif")])
    assert e.value.code == 1

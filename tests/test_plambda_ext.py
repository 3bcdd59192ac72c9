"""plambda language long tail: stack ops, registers, colon vars,
vector/matrix operators — self-checks plus cross-checks against the C
plambda binary (lib/imscript-lite/src/plambda.c) when built."""

import os
import subprocess

import numpy as np
import pytest

from bwd_nlkalman_tpu.utils import plambda
from bwd_nlkalman_tpu.io import read_tiff, write_tiff

REFBIN = os.environ.get("BNLK_REFBIN", "/tmp/refbuild/bin")
has_ref = os.path.exists(os.path.join(REFBIN, "plambda"))


@pytest.fixture
def rgb(rng):
    return rng.uniform(1, 200, (16, 24, 3)).astype(np.float32)


def test_stack_ops_swap_channels(rgb):
    """plambda.c:176-181 — six equivalent channel swaps."""
    want = rgb[..., [0, 2, 1]]
    for expr in (
        "x[0] x[2] x[1] join3",
        "x[0] x[2] x[1] join join",
        "x[0] x[1] x[2] rot join3",
        "x split rot join join",
        "x split rot join3",
    ):
        np.testing.assert_allclose(plambda(expr, rgb), want, err_msg=expr)


def test_stack_del_dup_njoin(rgb):
    np.testing.assert_allclose(plambda("x 5 del", rgb), rgb)
    np.testing.assert_allclose(plambda("x dup + 2 /", rgb), rgb, rtol=1e-6)
    out = plambda("x[0] x[1] x[2] 3 njoin", rgb)
    np.testing.assert_allclose(out, rgb)


def test_registers(rgb):
    """>n stores, <n recalls (Canny example, plambda.c:190)."""
    out = plambda("x[0] >1 <1 <1 *", rgb)
    np.testing.assert_allclose(out[..., 0], rgb[..., 0] ** 2, rtol=1e-6)
    with pytest.raises(ValueError):
        plambda("<3", rgb)


def test_colon_vars(rgb):
    h, w = rgb.shape[:2]
    out = plambda(":i :j +", rgb)
    i = np.arange(w, dtype=np.float32)[None, :]
    j = np.arange(h, dtype=np.float32)[:, None]
    np.testing.assert_allclose(out[..., 0], i + j)
    np.testing.assert_allclose(plambda(":w :h *", rgb)[..., 0],
                               np.full((h, w), w * h))
    r = plambda(":r", rgb)[..., 0]
    assert abs(r[h // 2, w // 2]) < 0.15 and r[0, 0] > 1.0


def test_vector_ops(rgb):
    np.testing.assert_allclose(
        plambda("x vavg", rgb)[..., 0], rgb.mean(-1), rtol=1e-6)
    np.testing.assert_allclose(
        plambda("x vnorm", rgb)[..., 0],
        np.sqrt((rgb ** 2).sum(-1)), rtol=1e-6)
    np.testing.assert_allclose(plambda("x vdim", rgb)[..., 0], 3.0)
    np.testing.assert_allclose(
        plambda("x x sprod", rgb)[..., 0], (rgb ** 2).sum(-1), rtol=1e-6)
    # cross product with itself is 0
    np.testing.assert_allclose(plambda("x x vprod", rgb), 0.0, atol=1e-4)


def test_polar_roundtrip(rng):
    v = rng.normal(0, 5, (8, 8, 2)).astype(np.float32)
    out = plambda("x topolar frompolar", v)
    np.testing.assert_allclose(out, v, atol=1e-4)


def test_matrix_ops(rng):
    m = rng.normal(0, 1, (6, 7, 4)).astype(np.float32)
    m[..., 0] += 3.0   # keep well-conditioned
    m[..., 3] += 3.0
    ident = plambda("x x minv mprod", m)
    want = np.broadcast_to(np.eye(2).reshape(-1), ident.shape)
    np.testing.assert_allclose(ident, want, atol=1e-4)
    tr = plambda("x mtrace", m)[..., 0]
    np.testing.assert_allclose(tr, m[..., 0] + m[..., 3], rtol=1e-5)
    det = plambda("x mdet", m)[..., 0]
    np.testing.assert_allclose(
        det, m[..., 0] * m[..., 3] - m[..., 1] * m[..., 2], rtol=1e-4)
    t = plambda("x mtrans", m)
    np.testing.assert_allclose(t, m[..., [0, 2, 1, 3]])


def test_ternaries_and_libm(rgb):
    np.testing.assert_allclose(
        plambda("x 50 150 bound", rgb), np.clip(rgb, 50, 150))
    np.testing.assert_allclose(
        plambda("x[0] 100 > 255 0 if", rgb)[..., 0],
        np.where(rgb[..., 0] > 100, 255.0, 0.0))
    np.testing.assert_allclose(
        plambda("x[0] x[1] hypot", rgb)[..., 0],
        np.hypot(rgb[..., 0], rgb[..., 1]), rtol=1e-6)
    np.testing.assert_allclose(
        plambda("x 0 360 range", rgb), rgb / 360.0, rtol=1e-6)
    np.testing.assert_allclose(
        plambda("x -1 *  q255", rgb), 0.0)


@pytest.mark.skipif(not has_ref, reason="reference binaries not built")
@pytest.mark.parametrize("expr", [
    "x split rot join join",
    "x dup + 2 /",
    "x[0] >1 <1 <1 * sqrt",
    ":i :j + :w /",
    "x vavg",
    "x 50 150 bound",
    "x[0] 100 > 255 0 if",
])
def test_matches_c_plambda(tmp_path, rgb, expr):
    src = str(tmp_path / "in.tif")
    dst = str(tmp_path / "out.tif")
    write_tiff(src, rgb)
    r = subprocess.run(
        [os.path.join(REFBIN, "plambda"), src, expr, "-o", dst],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    want = np.atleast_3d(read_tiff(dst))
    got = plambda(expr, rgb)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4,
                               err_msg=expr)

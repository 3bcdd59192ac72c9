"""TV-L1 flow validation: synthetic-shift recovery, energy decrease, and
cross-validation against the reference tvl1flow binary when built."""

import os
import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

from bwd_nlkalman_tpu.flow import tvl1_flow, flow_energy, occlusion_mask
from bwd_nlkalman_tpu.io import read_flo, write_pfm

REFBIN = os.environ.get("BNLK_REFBIN", "/tmp/refbuild/bin")
has_ref = os.path.exists(os.path.join(REFBIN, "tvl1flow"))


def _texture(rng, h, w, margin=16):
    base = rng.standard_normal((h + 2 * margin, w + 2 * margin)).astype(np.float32)
    k = np.exp(-0.5 * (np.arange(-6, 7) / 2.0) ** 2)
    k /= k.sum()
    t = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, base)
    t = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, t)
    t = (t - t.min()) / (t.max() - t.min()) * 255.0
    return t, margin


def _shifted_pair(rng, h, w, dx, dy):
    """i1(x) = i0(x + (dx,dy)); TV-L1 finds u with i1(x+u)=i0(x) => u = -(dx,dy)."""
    t, m = _texture(rng, h, w)
    i0 = t[m : m + h, m : m + w]
    yy, xx = np.meshgrid(np.arange(h) + m + dy, np.arange(w) + m + dx, indexing="ij")
    y0 = np.floor(yy).astype(int)
    x0 = np.floor(xx).astype(int)
    fy, fx = yy - y0, xx - x0
    i1 = (
        (1 - fy) * (1 - fx) * t[y0, x0]
        + (1 - fy) * fx * t[y0, x0 + 1]
        + fy * (1 - fx) * t[y0 + 1, x0]
        + fy * fx * t[y0 + 1, x0 + 1]
    ).astype(np.float32)
    return i0, i1


def test_recovers_constant_shift(rng):
    dx, dy = 2.3, -1.4
    i0, i1 = _shifted_pair(rng, 64, 80, dx, dy)
    u = np.asarray(tvl1_flow(jnp.asarray(i0), jnp.asarray(i1)))
    interior = np.s_[12:-12, 12:-12]
    assert abs(np.median(u[..., 0][interior]) + dx) < 0.25
    assert abs(np.median(u[..., 1][interior]) + dy) < 0.25


def test_energy_decreases(rng):
    i0, i1 = _shifted_pair(rng, 48, 48, 1.5, 0.8)
    zero = jnp.zeros((48, 48, 2), jnp.float32)
    u = tvl1_flow(jnp.asarray(i0), jnp.asarray(i1))
    e0 = float(flow_energy(jnp.asarray(i0), jnp.asarray(i1), zero))
    e1 = float(flow_energy(jnp.asarray(i0), jnp.asarray(i1), u))
    assert e1 < e0


def test_occlusion_mask():
    flow = np.zeros((8, 10, 2), np.float32)
    flow[:, 5:, 0] = 2.0  # du/dx jump of 2 at column 5
    m = np.asarray(occlusion_mask(jnp.asarray(flow), 0.75))
    assert m[3, 5] == 255.0
    assert m[3, 4] == 0.0
    assert m[3, 6] == 0.0
    assert m[0, 0] == 0.0


@pytest.mark.skipif(not has_ref, reason="reference binaries not built")
def test_against_reference_binary(tmp_path, rng):
    """End-point agreement with the C tvl1flow on a shifted pair."""
    i0, i1 = _shifted_pair(rng, 64, 80, 1.8, -0.9)
    p0, p1 = str(tmp_path / "i0.pfm"), str(tmp_path / "i1.pfm")
    fo = str(tmp_path / "o.flo")
    write_pfm(p0, i0)
    write_pfm(p1, i1)
    # defaults: tau .25 lambda .15 theta .3 nscales 100 fscale 0 zf .5 w 5 eps .01
    subprocess.run(
        [os.path.join(REFBIN, "tvl1flow"), p0, p1, fo, "1"],
        check=True, capture_output=True,
    )
    uc = read_flo(fo)
    u = np.asarray(tvl1_flow(jnp.asarray(i0), jnp.asarray(i1)))
    interior = np.s_[10:-10, 10:-10]
    err = np.sqrt(np.sum((u - uc) ** 2, axis=-1))[interior]
    assert float(np.mean(err)) < 0.15, f"mean EPE vs C = {np.mean(err)}"
    assert float(np.median(err)) < 0.1


@pytest.mark.skipif(not has_ref, reason="reference binaries not built")
def test_fscale_against_reference_binary(tmp_path, rng):
    """fscale=1 mode (the pipeline's half-resolution trick)."""
    i0, i1 = _shifted_pair(rng, 64, 64, -1.2, 0.7)
    p0, p1 = str(tmp_path / "i0.pfm"), str(tmp_path / "i1.pfm")
    fo = str(tmp_path / "o.flo")
    write_pfm(p0, i0)
    write_pfm(p1, i1)
    # args: nproc tau lambda theta nscales fscale  (pipeline OFPRMS form)
    subprocess.run(
        [os.path.join(REFBIN, "tvl1flow"), p0, p1, fo, "1", "0", "0.25", "0", "0", "1"],
        check=True, capture_output=True,
    )
    uc = read_flo(fo)
    u = np.asarray(tvl1_flow(jnp.asarray(i0), jnp.asarray(i1), lambda_=0.25, fscale=1))
    interior = np.s_[10:-10, 10:-10]
    err = np.sqrt(np.sum((u - uc) ** 2, axis=-1))[interior]
    assert float(np.mean(err)) < 0.15, f"mean EPE vs C = {np.mean(err)}"

"""Model-registry facade: every registered variant denoises end to end.

The registry (models.get_model) is the stable "model zoo" API over the
reference's pipeline variants x TRAIN14 operating points; each entry
must run on a tiny sequence and beat the noisy input's PSNR.
"""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compiles six pipeline variants

from bwd_nlkalman_tpu import models


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10 * np.log10(255.0 ** 2 / mse)


@pytest.fixture(scope="module")
def seq():
    rng = np.random.default_rng(5)
    sigma = 20.0
    h, w, t = 48, 64, 3
    yy, xx = np.meshgrid(np.arange(h + 8), np.arange(w + 8), indexing="ij")
    base = 120 + 80 * np.sin(0.09 * xx) * np.cos(0.11 * yy)
    clean = np.stack(
        [base[i : i + h, i : i + w] for i in range(t)])[..., None]
    noisy = (clean + sigma * rng.standard_normal(clean.shape)).astype(
        np.float32)
    return clean, noisy, sigma


@pytest.mark.parametrize("name", sorted(models.MODELS))
def test_model_denoises(seq, name):
    clean, noisy, sigma = seq
    run = models.get_model(name, sigma)
    out = np.asarray(run(jnp.asarray(noisy)))
    assert out.shape == noisy.shape
    assert np.isfinite(out).all()
    assert _psnr(clean, out) > _psnr(clean, noisy) + 1.0


def test_unknown_model_raises():
    with pytest.raises(KeyError):
        models.get_model("nope", 20.0)

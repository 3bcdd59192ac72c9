"""Separable aggregation window functions.

Reference: window_function, src/nlkalman.c:365-419.  The filter kernels use
the "gaussian" window (selected at src/nlkalman.c:542) to taper patch
contributions and reduce blocking artifacts.  Computed in numpy at trace
time; returned as a (N, N) jnp array.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _window_1d(kind: str, n: int) -> np.ndarray:
    nn = float(n)
    n2 = (nn - 1.0) / 2.0
    x = np.arange(n, dtype=np.float64)
    if kind == "parzen":
        nc = x - n2
        w = np.where(
            np.abs(nc) <= nn / 4.0,
            1.0 - 24.0 * nc * nc / nn / nn * (1.0 - 2.0 / nn * np.abs(nc)),
            2.0 * (1.0 - 2.0 / nn * np.abs(nc)) ** 3,
        )
    elif kind == "welch":
        nc = (x - n2) / n2
        w = 1.0 - nc * nc
    elif kind == "sine":
        w = np.sin(np.pi * x / (nn - 1))
    elif kind == "hanning":
        w = np.sin(np.pi * x / (nn - 1)) ** 2
    elif kind == "hamming":
        w = 0.54 - 0.46 * np.cos(2 * np.pi * x / (nn - 1))
    elif kind == "blackman":
        w = (
            0.42
            - 0.5 * np.cos(2 * np.pi * x / (nn - 1))
            + 0.08 * np.cos(4 * np.pi * x / (nn - 1))
        )
    elif kind == "gaussian":
        s = 0.4  # scale parameter (reference src/nlkalman.c:404)
        xx = (x - n2) / n2 / s
        w = np.exp(-0.5 * xx * xx)
    else:  # constant / flat
        w = np.ones(n)
    return w.astype(np.float32)


def window_function(kind: str, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """2-D separable window w[i, j] = w1[i] * w1[j]."""
    w1 = _window_1d(kind, n)
    return jnp.asarray(np.outer(w1, w1), dtype=dtype)

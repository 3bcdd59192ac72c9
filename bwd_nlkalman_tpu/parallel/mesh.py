"""Device mesh helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(dp: int = 1, sp: int | None = None, devices=None) -> Mesh:
    """2-D ('dp', 'sp') mesh: batch data parallelism x spatial sharding.

    sp defaults to (#devices / dp).  Lay 'sp' innermost so halo ppermutes
    ride neighboring ICI links.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if sp is None:
        sp = n // dp
    if dp * sp != n:
        raise ValueError(f"dp*sp = {dp}*{sp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))

"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use XLA's
host-platform device virtualization.  Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# the env var alone does not override the axon TPU plugin — force CPU here
jax.config.update("jax_platforms", "cpu")

# NO persistent compilation cache for tests.  The jax-0.9.0 CPU cache
# writer segfaults deterministically while serializing one of
# test_round3's flow-scan executables, leaving a truncated entry whose
# subsequent READ also segfaults — so neither write-thresholding nor a
# dedicated directory is safe.  The suite tolerates fresh compiles (the
# fast subset stays <5 min; the slow modules are interpret-runtime-
# bound).  bench and the on-chip tools keep /tmp/bnlk_jax_cache (the
# TPU-backend writer has never crashed).


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    A long pytest process accumulates hundreds of XLA CPU executables;
    late compilations have been observed to crash the native compiler
    (segfault in backend_compile_and_load).  Clearing per module keeps the
    process small; the persistent compilation cache makes recompiles cheap.
    """
    yield
    jax.clear_caches()

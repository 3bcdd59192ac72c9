"""Sequence-level drivers: the on-device equivalent of nlkalman-seq.sh.

The reference pipeline is a bash loop spawning one process per stage per
frame, with all interstage data on disk (scripts/nlkalman-seq.sh:56-104,
smoothing :114-151).  Here the whole recursion runs on device:

- forward filtering is a lax.scan over frames with carry {flt1, flt2}
  (the recursion state the reference keeps as files, src/main-seq.c:448);
- each scan step computes TV-L1 backward flow (noisy_t -> flt2_{t-1}),
  the divergence occlusion mask, warps, and the two filtering passes
  (pass 2 consumes pass 1's output as basic estimate,
  src/main-flt.c:356,373);
- backward RTS smoothing is a reverse lax.scan with carry {smo}, forward
  flow flt2_t -> smo_{t+1} (scripts/nlkalman-seq.sh:124-151), starting
  from smo_L = flt2_L (:122).

Frames are (T, H, W, C) float32 RGB in [0, 255]; color conversion to the
opponent space happens around each filter call exactly like the binaries
do on load/save (src/main-flt.c:340-342, 376-388), and flow runs on
Rec.601 luma like the tvl1flow CLI.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..core import nlkalman_filter_frame, nlkalman_smooth_frame
from ..flow import tvl1_flow, occlusion_mask
from ..flow.tvl1 import luma
from ..ops.color import rgb2opp, opp2rgb
from ..ops.warp import warp_bicubic_nan
from ..params import NLKParams, FilterMode, default_params


@dataclasses.dataclass(frozen=True)
class FlowConfig:
    """Optical-flow parameters as the pipeline scripts pass them.

    Defaults = the scripts' OPM "1 0.25 0.75" triple per direction
    (scripts/nlkalman-seq.sh:12,47-51): fscale 1 (half-resolution flow),
    data weight lambda 0.25, occlusion threshold 0.75.
    """

    fscale: int = 1
    lambda_: float = 0.25
    occ_threshold: float = 0.75
    tau: float = 0.25
    theta: float = 0.3
    nscales: int = 100
    zfactor: float = 0.5
    nwarps: int = 5
    epsilon: float = 0.01
    # None = the reference's MAX_ITERATIONS (300), or BNLK_TVL1_MAXIT env
    max_iters: int | None = None
    # warm-start the scan's flow from the previous step's level-fscale
    # solution instead of re-solving the pyramid from zero every frame
    # (TPU-first streaming deviation; PSNR-gated, tools/flow_warm_gate.py)
    warm_start: bool = False
    # reduced solver effort for WARM steps only: a converged carry needs
    # fewer re-linearizations than the cold zero iterate (the reference
    # always solves from zero with nwarps=5, tvl1flow_lib.c:410-436).
    # None = same effort as cold.  PSNR-gated: tools/flow_warm_gate.py
    # --warm-nwarps; measured EPE-vs-cold < 0.03 px at nwarps=3
    # (tools/bench_flow_warm.py).  The residual gate still falls back to
    # the full-effort cold pyramid on stale carries.
    warm_nwarps: int | None = None
    warm_max_iters: int | None = None

    def _kw(self, dyn):
        dyn = dyn or {}
        return dict(
            tau=self.tau, lambda_=dyn.get("lambda_", self.lambda_),
            theta=self.theta, nscales=self.nscales, fscale=self.fscale,
            zfactor=self.zfactor, nwarps=self.nwarps, epsilon=self.epsilon,
            max_iters=dyn.get("max_iters", self.max_iters),
        )

    def flow(self, i0, i1, dyn=None):
        """dyn: optional dict of TRACED overrides — 'max_iters' and
        'lambda_' ride the fused kernel's SMEM, so retuning them
        (training searches over the script's DW data weight,
        tools/flow_maxit_gate.py) reuses one compiled executable.
        Mirrors the NLK engines' dyn-dict pattern."""
        return tvl1_flow(i0, i1, **self._kw(dyn))

    def flow_cold_carry(self, i0, i1, dyn=None):
        """Full-pyramid solve that also returns the warm-start carry."""
        return tvl1_flow(i0, i1, return_carry=True, **self._kw(dyn))

    def flow_warm(self, i0, i1, u_carry, dyn=None):
        """Level-fscale-only solve initialized from the carried flow."""
        from ..flow.tvl1 import tvl1_flow_warm
        return tvl1_flow_warm(
            i0, i1, u_carry, warm_nwarps=self.warm_nwarps,
            warm_max_iters=self.warm_max_iters, **self._kw(dyn))

    def occ_th(self, dyn=None):
        return (dyn or {}).get("occ_threshold", self.occ_threshold)


def filter_frame_pair(
    noisy: jnp.ndarray,
    flt1_prev: jnp.ndarray | None,
    flt2_prev: jnp.ndarray | None,
    sigma: float,
    p1: NLKParams,
    p2: NLKParams,
    flow_cfg: FlowConfig = FlowConfig(),
    flow_dyn: dict | None = None,
):
    """Two-pass filtering of one frame given previous outputs (RGB in/out).

    Returns (flt1, flt2).  With no previous frame this is the spatial-only
    first-frame path (scripts/nlkalman-seq.sh:34-41).
    """
    n_opp = rgb2opp(noisy)
    if flt2_prev is None:
        f11 = nlkalman_filter_frame(n_opp, None, None, None, sigma, p1)
        f21 = nlkalman_filter_frame(n_opp, None, None, f11, sigma, p2)
        return opp2rgb(f11), opp2rgb(f21)

    flow = flow_cfg.flow(luma(noisy), luma(flt2_prev), dyn=flow_dyn)
    return _filter_with_flow(
        noisy, flt1_prev, flt2_prev, flow,
        flow_cfg.occ_th(flow_dyn), sigma, p1, p2,
    )


def _filter_with_flow(noisy, flt1_prev, flt2_prev, flow, occ_th, sigma,
                      p1, p2):
    """Two-pass filtering given an already-computed backward flow."""
    n_opp = rgb2opp(noisy)
    occ = occlusion_mask(flow, occ_th)
    # both previous outputs ride ONE gather: same flow => same validity
    c = noisy.shape[-1]
    both = jnp.concatenate([rgb2opp(flt1_prev), rgb2opp(flt2_prev)], axis=-1)
    wb, v1 = warp_bicubic_nan(both, flow, occ)
    f11 = nlkalman_filter_frame(n_opp, wb[..., :c], v1, None, sigma, p1)
    f21 = nlkalman_filter_frame(n_opp, wb[..., c:], v1, f11, sigma, p2)
    return opp2rgb(f11), opp2rgb(f21)


@functools.partial(jax.jit, static_argnames=("sigma", "p1", "p2", "flow_cfg"))
def filter_sequence(
    noisy: jnp.ndarray,
    sigma: float,
    p1: NLKParams | None = None,
    p2: NLKParams | None = None,
    flow_cfg: FlowConfig = FlowConfig(),
    flow_dyn: dict | None = None,
):
    """Forward-filter a whole sequence (T, H, W, C) -> (flt1, flt2) stacks."""
    if p1 is None:
        p1 = default_params(sigma, FilterMode.FLT1)
    if p2 is None:
        p2 = default_params(sigma, FilterMode.FLT2)

    f11_0, f21_0 = filter_frame_pair(noisy[0], None, None, sigma, p1, p2, flow_cfg)

    if flow_cfg.warm_start and noisy.shape[0] > 1:
        # frame 1 is peeled out of the scan: its flow runs the cold
        # full pyramid and seeds the level-fscale carry; every further
        # step warm-starts from the previous step's solution
        flow1, u_fs = flow_cfg.flow_cold_carry(
            luma(noisy[1]), luma(f21_0), dyn=flow_dyn)
        f11_1, f21_1 = _filter_with_flow(
            noisy[1], f11_0, f21_0, flow1,
            flow_cfg.occ_th(flow_dyn), sigma, p1, p2)

        def wstep(carry, frame):
            flt1_prev, flt2_prev, u_c = carry
            flow, u_c = flow_cfg.flow_warm(
                luma(frame), luma(flt2_prev), u_c, dyn=flow_dyn)
            f11, f21 = _filter_with_flow(
                frame, flt1_prev, flt2_prev, flow,
                flow_cfg.occ_th(flow_dyn), sigma, p1, p2)
            return (f11, f21, u_c), (f11, f21)

        _, (flt1_rest, flt2_rest) = jax.lax.scan(
            wstep, (f11_1, f21_1, u_fs), noisy[2:]
        )
        flt1 = jnp.concatenate([f11_0[None], f11_1[None], flt1_rest], axis=0)
        flt2 = jnp.concatenate([f21_0[None], f21_1[None], flt2_rest], axis=0)
        return flt1, flt2

    def step(carry, frame):
        flt1_prev, flt2_prev = carry
        f11, f21 = filter_frame_pair(
            frame, flt1_prev, flt2_prev, sigma, p1, p2, flow_cfg, flow_dyn
        )
        return (f11, f21), (f11, f21)

    (_, _), (flt1_rest, flt2_rest) = jax.lax.scan(
        step, (f11_0, f21_0), noisy[1:]
    )
    flt1 = jnp.concatenate([f11_0[None], flt1_rest], axis=0)
    flt2 = jnp.concatenate([f21_0[None], flt2_rest], axis=0)
    return flt1, flt2


@functools.partial(jax.jit, static_argnames=("sigma", "p1", "p2"))
def filter_sequence_precomputed(
    noisy: jnp.ndarray,
    bflow: jnp.ndarray,
    bocc: jnp.ndarray,
    sigma: float,
    p1: NLKParams | None = None,
    p2: NLKParams | None = None,
    dyn1: dict | None = None,
    dyn2: dict | None = None,
):
    """Forward filtering with PRECOMPUTED backward flow/occlusions.

    The training protocol's economy (nlkalman-train.sh:17-28): flow is
    computed once per (sequence, sigma) from the NOISY frames
    (tvl1flow-seq.sh:26-50) and reused across every parameter trial —
    unlike the production driver, which recomputes flow against the
    previous FILTERED frame each step.  bflow: (T, H, W, 2); bocc:
    (T, H, W) (nonzero = occluded); frame 0's entries are unused.
    """
    if p1 is None:
        p1 = default_params(sigma, FilterMode.FLT1)
    if p2 is None:
        p2 = default_params(sigma, FilterMode.FLT2)

    n0 = rgb2opp(noisy[0])
    f11o = nlkalman_filter_frame(n0, None, None, None, sigma, p1, dyn=dyn1)
    f21o = nlkalman_filter_frame(n0, None, None, f11o, sigma, p2, dyn=dyn2)
    f11_0, f21_0 = opp2rgb(f11o), opp2rgb(f21o)

    def step(carry, xs):
        frame, flow, occ = xs
        flt1_prev, flt2_prev = carry
        n_opp = rgb2opp(frame)
        c = frame.shape[-1]
        both = jnp.concatenate(
            [rgb2opp(flt1_prev), rgb2opp(flt2_prev)], axis=-1
        )
        wb, v1 = warp_bicubic_nan(both, flow, occ)
        f11 = nlkalman_filter_frame(n_opp, wb[..., :c], v1, None, sigma, p1,
                                    dyn=dyn1)
        f21 = nlkalman_filter_frame(n_opp, wb[..., c:], v1, f11, sigma, p2,
                                    dyn=dyn2)
        out = (opp2rgb(f11), opp2rgb(f21))
        return out, out

    (_, _), (flt1_rest, flt2_rest) = jax.lax.scan(
        step, (f11_0, f21_0), (noisy[1:], bflow[1:], bocc[1:])
    )
    flt1 = jnp.concatenate([f11_0[None], flt1_rest], axis=0)
    flt2 = jnp.concatenate([f21_0[None], flt2_rest], axis=0)
    return flt1, flt2


@functools.partial(jax.jit, static_argnames=("sigma", "ps"))
def smooth_sequence_precomputed(
    flt2: jnp.ndarray,
    fflow: jnp.ndarray,
    focc: jnp.ndarray,
    sigma: float,
    ps: NLKParams | None = None,
    dyns: dict | None = None,
):
    """Backward RTS smoothing with PRECOMPUTED forward flow/occlusions
    (fflow[t]: frame t -> t+1 from the noisy fixtures; the last frame's
    entries are unused)."""
    if ps is None:
        ps = default_params(sigma, FilterMode.SMO1)

    smo_last = flt2[-1]

    def step(carry, xs):
        frame_flt2, flow, occ = xs
        smo_next = carry
        w0, v0 = warp_bicubic_nan(rgb2opp(smo_next), flow, occ)
        smo = opp2rgb(
            nlkalman_smooth_frame(rgb2opp(frame_flt2), w0, v0, sigma, ps,
                                  dyn=dyns)
        )
        return smo, smo

    _, smo_rest = jax.lax.scan(
        step, smo_last, (flt2[:-1], fflow[:-1], focc[:-1]), reverse=True
    )
    return jnp.concatenate([smo_rest, smo_last[None]], axis=0)


@functools.partial(jax.jit, static_argnames=("sigma", "ps", "flow_cfg"))
def smooth_sequence(
    flt2: jnp.ndarray,
    sigma: float,
    ps: NLKParams | None = None,
    flow_cfg: FlowConfig = FlowConfig(),
    flow_dyn: dict | None = None,
):
    """Backward RTS smoothing of the filtered stack (T, H, W, C) -> smo1."""
    if ps is None:
        ps = default_params(sigma, FilterMode.SMO1)

    smo_last = flt2[-1]

    def smooth_with_flow(frame_flt2, smo_next, flow):
        occ = occlusion_mask(flow, flow_cfg.occ_th(flow_dyn))
        w0, v0 = warp_bicubic_nan(rgb2opp(smo_next), flow, occ)
        return opp2rgb(
            nlkalman_smooth_frame(rgb2opp(frame_flt2), w0, v0, sigma, ps)
        )

    if flow_cfg.warm_start and flt2.shape[0] > 1:
        # frame T-2 (the first one the reverse scan would process) is
        # peeled out: cold pyramid seeds the carry, the rest warm-start
        flow1, u_fs = flow_cfg.flow_cold_carry(
            luma(flt2[-2]), luma(smo_last), dyn=flow_dyn)
        smo_pen = smooth_with_flow(flt2[-2], smo_last, flow1)

        def wstep(carry, frame_flt2):
            smo_next, u_c = carry
            flow, u_c = flow_cfg.flow_warm(
                luma(frame_flt2), luma(smo_next), u_c, dyn=flow_dyn)
            smo = smooth_with_flow(frame_flt2, smo_next, flow)
            return (smo, u_c), smo

        _, smo_rest = jax.lax.scan(
            wstep, (smo_pen, u_fs), flt2[:-2], reverse=True)
        return jnp.concatenate(
            [smo_rest, smo_pen[None], smo_last[None]], axis=0)

    def step(carry, frame_flt2):
        smo_next = carry
        flow = flow_cfg.flow(luma(frame_flt2), luma(smo_next), dyn=flow_dyn)
        smo = smooth_with_flow(frame_flt2, smo_next, flow)
        return smo, smo

    _, smo_rest = jax.lax.scan(step, smo_last, flt2[:-1], reverse=True)
    return jnp.concatenate([smo_rest, smo_last[None]], axis=0)


@functools.partial(jax.jit, static_argnames=("sigma", "p1", "p2", "ps", "flow_cfg"))
def fsmo_sequence(
    noisy: jnp.ndarray,
    sigma: float,
    p1: NLKParams | None = None,
    p2: NLKParams | None = None,
    ps: NLKParams | None = None,
    flow_cfg: FlowConfig = FlowConfig(),
    flow_dyn: dict | None = None,
):
    """Causal forward smoothing interleaved with filtering
    (scripts/nlkalman-fsmo-seq.sh:60-94): frame t is smoothed against
    smo_{t-1}, reusing the backward flow/occlusions of the filter step;
    smo_first = flt2_first (:58).  Returns (flt1, flt2, smo1)."""
    if p1 is None:
        p1 = default_params(sigma, FilterMode.FLT1)
    if p2 is None:
        p2 = default_params(sigma, FilterMode.FLT2)
    if ps is None:
        ps = default_params(sigma, FilterMode.SMO1)

    f11_0, f21_0 = filter_frame_pair(noisy[0], None, None, sigma, p1, p2, flow_cfg)
    smo_0 = f21_0

    def step(carry, frame):
        flt1_prev, flt2_prev, smo_prev = carry
        flow = flow_cfg.flow(luma(frame), luma(flt2_prev), dyn=flow_dyn)
        occ = occlusion_mask(flow, flow_cfg.occ_th(flow_dyn))
        n_opp = rgb2opp(frame)
        # all three previous outputs ride ONE gather (same flow/validity)
        c = frame.shape[-1]
        tri = jnp.concatenate(
            [rgb2opp(flt1_prev), rgb2opp(flt2_prev), rgb2opp(smo_prev)],
            axis=-1,
        )
        wt, v1 = warp_bicubic_nan(tri, flow, occ)
        f11 = nlkalman_filter_frame(n_opp, wt[..., :c], v1, None, sigma, p1)
        f21 = nlkalman_filter_frame(n_opp, wt[..., c : 2 * c], v1, f11, sigma, p2)
        f21_rgb = opp2rgb(f21)
        smo = opp2rgb(
            nlkalman_smooth_frame(f21, wt[..., 2 * c :], v1, sigma, ps)
        )
        f11_rgb = opp2rgb(f11)
        return (f11_rgb, f21_rgb, smo), (f11_rgb, f21_rgb, smo)

    _, (f1r, f2r, smr) = jax.lax.scan(step, (f11_0, f21_0, smo_0), noisy[1:])
    flt1 = jnp.concatenate([f11_0[None], f1r], axis=0)
    flt2 = jnp.concatenate([f21_0[None], f2r], axis=0)
    smo1 = jnp.concatenate([smo_0[None], smr], axis=0)
    return flt1, flt2, smo1


@functools.partial(jax.jit, static_argnames=("sigma", "ps", "flow_cfg"))
def lsmo_sequence(
    flt2: jnp.ndarray,
    sigma: float,
    ps: NLKParams | None = None,
    flow_cfg: FlowConfig = FlowConfig(),
    flow_dyn: dict | None = None,
):
    """Lag-1 smoother (scripts/nlkalman-lsmo-seq.sh:87-118): after frame t
    is filtered, frame t-1 is smoothed against flt2_t along the forward
    flow flt2_{t-1} -> flt2_t; the last frame passes through."""
    if ps is None:
        ps = default_params(sigma, FilterMode.SMO1)

    def step(_, pair):
        f_prev, f_cur = pair
        flow = flow_cfg.flow(luma(f_prev), luma(f_cur), dyn=flow_dyn)
        occ = occlusion_mask(flow, flow_cfg.occ_th(flow_dyn))
        w0, v0 = warp_bicubic_nan(rgb2opp(f_cur), flow, occ)
        lsm = opp2rgb(nlkalman_smooth_frame(rgb2opp(f_prev), w0, v0, sigma, ps))
        return 0, lsm

    pairs = (flt2[:-1], flt2[1:])
    _, lsm = jax.lax.scan(step, 0, pairs)
    return jnp.concatenate([lsm, flt2[-1:]], axis=0)


def denoise_sequence(
    noisy: jnp.ndarray,
    sigma: float,
    p1: NLKParams | None = None,
    p2: NLKParams | None = None,
    ps: NLKParams | None = None,
    flow_cfg: FlowConfig = FlowConfig(),
    smoothing: bool = True,
    smooth_flow_cfg: FlowConfig | None = None,
    flow_dyn: dict | None = None,
    sflow_dyn: dict | None = None,
):
    """Full pipeline: two-pass forward filtering + backward smoothing.

    Returns (flt1, flt2, smo1) stacks; smo1 is None when smoothing=False
    (the SPM=="no" mode, scripts/nlkalman-seq.sh:114).  smooth_flow_cfg
    lets the backward pass use its own flow parameters (the second OPM
    triple, scripts/nlkalman-seq.sh:12); defaults to flow_cfg.
    flow_dyn / sflow_dyn: optional dicts of TRACED TV-L1 overrides
    ('max_iters', 'lambda_', 'occ_threshold') for the filtering /
    smoothing flow — sweeping them (the reference's DW / occlusion-
    threshold searches) reuses one compiled executable; sflow_dyn
    defaults to flow_dyn.
    """
    flt1, flt2 = filter_sequence(noisy, sigma, p1, p2, flow_cfg,
                                 flow_dyn=flow_dyn)
    if not smoothing:
        return flt1, flt2, None
    smo1 = smooth_sequence(flt2, sigma, ps, smooth_flow_cfg or flow_cfg,
                           flow_dyn=flow_dyn if sflow_dyn is None else sflow_dyn)
    return flt1, flt2, smo1


def denoise_batch(
    noisy_batch: jnp.ndarray,
    sigma: float,
    mesh=None,
    **kw,
):
    """Denoise a batch of clips (B, T, H, W, C) — the TPU equivalent of the
    reference's GNU-parallel fan-out over sequences
    (scripts/dev-scripts/train-nn-smoothing.sh:118-120).

    With a mesh, the batch axis is sharded over its 'dp' axis (data
    parallelism over clips); otherwise a plain vmap.
    """
    def one(v):
        flt1, flt2 = filter_sequence(v, sigma)
        smo1 = smooth_sequence(flt2, sigma)
        return flt1, flt2, smo1

    batched = jax.vmap(one)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P("dp", None, None, None, None))
        noisy_batch = jax.lax.with_sharding_constraint(
            jnp.asarray(noisy_batch), sh
        )
    return batched(jnp.asarray(noisy_batch))

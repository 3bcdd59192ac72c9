"""Sharded end-to-end sequence driver: the whole nlkalman-seq pipeline
(filter scan + backward RTS smoothing, flow included) under one
('dp', 'sp') mesh.

This composes the building blocks that are individually validated against
the single-chip kernels:

- the NL-Kalman passes run under shard_map with explicit ppermute halo
  exchange over 'sp' (parallel/spatial._spatial_pass — equality-tested
  vs the single-chip kernels in tests/test_parallel.py);
- flow / occlusion / warp / color are GSPMD-auto partitioned: they are
  elementwise maps, small-stencil convolutions and bounded gathers, so
  XLA shards them along the same 'sp' rows and inserts the halo
  collectives itself;
- the temporal recursion is the same lax.scan as the single-chip
  drivers (pipeline/sequence.py), carrying {flt1, flt2} forward and
  {smo} backward — the scan carry keeps its dp x sp sharding across
  steps, so no per-frame resharding happens.

The reference's whole-pipeline dataflow being mapped is
scripts/nlkalman-seq.sh:56-151 (per-frame tvl1flow -> plambda occlusion
-> nlkalman-flt x2; then backward tvl1flow -> nlkalman-smo), with the
file-on-disk boundaries replaced by on-device values and the
process-level parallelism replaced by the mesh (SURVEY.md section 2.7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.nlkalman import _auto_chunk
from ..flow import occlusion_mask
from ..flow.tvl1 import luma
from ..ops.color import rgb2opp, opp2rgb
from ..ops.warp import warp_bicubic_nan
from ..params import NLKParams, FilterMode, default_params
from ..pipeline.sequence import FlowConfig
from .spatial import _spatial_pass


def _resolve(sigma, p1, p2, ps):
    if p1 is None:
        p1 = default_params(sigma, FilterMode.FLT1)
    if p2 is None:
        p2 = default_params(sigma, FilterMode.FLT2)
    if ps is None:
        ps = default_params(sigma, FilterMode.SMO1)
    return p1, p2, ps


@functools.partial(
    jax.jit,
    static_argnames=("sigma", "p1", "p2", "ps", "flow_cfg", "mesh",
                     "smoothing", "engine"),
)
def denoise_sequence_sharded(
    noisy: jnp.ndarray,
    sigma: float,
    mesh: Mesh,
    p1: NLKParams | None = None,
    p2: NLKParams | None = None,
    ps: NLKParams | None = None,
    flow_cfg: FlowConfig = FlowConfig(),
    smoothing: bool = True,
    engine: str = "auto",
):
    """Full sharded pipeline over one clip (T, H, W, C) -> (flt1, flt2, smo1).

    H is sharded over the mesh's 'sp' axis (the frame must satisfy the
    same divisibility rules as _spatial_pass); 'dp' is expected to be 1
    for a single clip (batch over clips belongs to denoise_batch /
    sharded_filter_step).  Flow uses the XLA solver path so GSPMD can
    partition it; the warm-start streaming carry (flow_cfg.warm_start)
    rides the scan exactly like the single-chip driver.
    """
    p1, p2, ps = _resolve(sigma, p1, p2, ps)
    h, w = noisy.shape[1:3]
    frame_shard = NamedSharding(mesh, P(None, "sp", None, None))
    noisy = jax.lax.with_sharding_constraint(noisy, frame_shard)

    def chunk(prms, mode):
        rad = prms.search_sz_x if mode == "filter" else prms.search_sz_t
        return _auto_chunk(h // mesh.shape["sp"], w, noisy.shape[3],
                           prms.patch_sz, rad)

    def filter_pair(frame, flt1_prev, flt2_prev, flow):
        n_opp = rgb2opp(frame)
        occ = occlusion_mask(flow, flow_cfg.occ_threshold)
        c = frame.shape[-1]
        both = jnp.concatenate(
            [rgb2opp(flt1_prev), rgb2opp(flt2_prev)], axis=-1)
        wb, v1 = warp_bicubic_nan(both, flow, occ)
        f11 = _spatial_pass(
            n_opp, jnp.where(v1[..., None], wb[..., :c], 0.0), v1, n_opp,
            float(sigma), p1, "filter", True, False, mesh,
            chunk(p1, "filter"), engine=engine)
        f21 = _spatial_pass(
            n_opp, jnp.where(v1[..., None], wb[..., c:], 0.0), v1, f11,
            float(sigma), p2, "filter", True, True, mesh,
            chunk(p2, "filter"), engine=engine)
        return opp2rgb(f11), opp2rgb(f21)

    # frame 0: spatial-only (scripts/nlkalman-seq.sh:34-41)
    n0 = rgb2opp(noisy[0])
    zeros = jnp.zeros_like(n0)
    novalid = jnp.zeros(n0.shape[:2], bool)
    f11o = _spatial_pass(n0, zeros, novalid, n0, float(sigma), p1,
                         "filter", False, False, mesh, chunk(p1, "filter"),
                         engine=engine)
    f21o = _spatial_pass(n0, zeros, novalid, f11o, float(sigma), p2,
                         "filter", False, True, mesh, chunk(p2, "filter"),
                         engine=engine)
    f11_0, f21_0 = opp2rgb(f11o), opp2rgb(f21o)

    # the flow solver must stay on the XLA path under GSPMD (a Pallas
    # kernel cannot be auto-partitioned; it would be run replicated)
    fkw = dict(tau=flow_cfg.tau, lambda_=flow_cfg.lambda_,
               theta=flow_cfg.theta, nscales=flow_cfg.nscales,
               fscale=flow_cfg.fscale, zfactor=flow_cfg.zfactor,
               nwarps=flow_cfg.nwarps, epsilon=flow_cfg.epsilon,
               max_iters=flow_cfg.max_iters, backend="xla")

    from ..flow.tvl1 import tvl1_flow, tvl1_flow_warm, flow_carry_shape

    # reduced warm effort follows the single-device driver (FlowConfig
    # .warm_nwarps / .warm_max_iters; None = full cold effort)
    wkw = dict(fkw, warm_nwarps=flow_cfg.warm_nwarps,
               warm_max_iters=flow_cfg.warm_max_iters)

    if flow_cfg.warm_start and noisy.shape[0] > 1:
        flow1, u_fs = tvl1_flow(luma(noisy[1]), luma(f21_0),
                                return_carry=True, **fkw)
        f11_1, f21_1 = filter_pair(noisy[1], f11_0, f21_0, flow1)

        def wstep(carry, frame):
            flt1_prev, flt2_prev, u_c = carry
            flow, u_c = tvl1_flow_warm(
                luma(frame), luma(flt2_prev), u_c, **wkw)
            f11, f21 = filter_pair(frame, flt1_prev, flt2_prev, flow)
            return (f11, f21, u_c), (f11, f21)

        _, (flt1_rest, flt2_rest) = jax.lax.scan(
            wstep, (f11_1, f21_1, u_fs), noisy[2:])
        flt1 = jnp.concatenate([f11_0[None], f11_1[None], flt1_rest], axis=0)
        flt2 = jnp.concatenate([f21_0[None], f21_1[None], flt2_rest], axis=0)
    else:
        def step(carry, frame):
            flt1_prev, flt2_prev = carry
            flow = tvl1_flow(luma(frame), luma(flt2_prev), **fkw)
            f11, f21 = filter_pair(frame, flt1_prev, flt2_prev, flow)
            return (f11, f21), (f11, f21)

        _, (flt1_rest, flt2_rest) = jax.lax.scan(
            step, (f11_0, f21_0), noisy[1:])
        flt1 = jnp.concatenate([f11_0[None], flt1_rest], axis=0)
        flt2 = jnp.concatenate([f21_0[None], flt2_rest], axis=0)

    if not smoothing:
        return flt1, flt2, None

    # backward RTS smoothing (scripts/nlkalman-seq.sh:124-151): reverse
    # scan with forward flow flt2_t -> smo_{t+1}; smo_L = flt2_L (:122)
    smo_last = flt2[-1]

    def smooth_one(frame_flt2, smo_next, flow):
        occ = occlusion_mask(flow, flow_cfg.occ_threshold)
        w0, v0 = warp_bicubic_nan(rgb2opp(smo_next), flow, occ)
        smo = _spatial_pass(
            rgb2opp(frame_flt2), jnp.where(v0[..., None], w0, 0.0), v0,
            rgb2opp(frame_flt2), float(sigma), ps, "smooth", True, False,
            mesh, chunk(ps, "smooth"), engine=engine)
        return opp2rgb(smo)

    if flow_cfg.warm_start and flt2.shape[0] > 1:
        # mirror smooth_sequence's warm path: the first reverse step is
        # peeled out to seed the carry with a cold full-pyramid solve
        flow1, u_fs = tvl1_flow(luma(flt2[-2]), luma(smo_last),
                                return_carry=True, **fkw)
        smo_pen = smooth_one(flt2[-2], smo_last, flow1)

        def wsstep(carry, frame_flt2):
            smo_next, u_c = carry
            flow, u_c = tvl1_flow_warm(
                luma(frame_flt2), luma(smo_next), u_c, **wkw)
            smo = smooth_one(frame_flt2, smo_next, flow)
            return (smo, u_c), smo

        _, smo_rest = jax.lax.scan(
            wsstep, (smo_pen, u_fs), flt2[:-2], reverse=True)
        return flt1, flt2, jnp.concatenate(
            [smo_rest, smo_pen[None], smo_last[None]], axis=0)

    def sstep(carry, frame_flt2):
        smo_next = carry
        flow = tvl1_flow(luma(frame_flt2), luma(smo_next), **fkw)
        smo = smooth_one(frame_flt2, smo_next, flow)
        return smo, smo

    _, smo_rest = jax.lax.scan(sstep, smo_last, flt2[:-1], reverse=True)
    smo1 = jnp.concatenate([smo_rest, smo_last[None]], axis=0)
    return flt1, flt2, smo1

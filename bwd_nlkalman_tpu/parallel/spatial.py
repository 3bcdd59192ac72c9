"""Spatially-sharded NL-Kalman kernels (shard_map + ppermute halo exchange).

A frame's H axis is split across the 'sp' mesh axis.  Each shard:

1. exchanges `halo = search_radius + patch_sz` rows with its neighbors
   (lax.ppermute; edge shards receive zeros, masked out by global bounds),
2. runs the dense kernel on its extended block for the stride-psz/2 sites
   it owns, with candidate windows clamped at GLOBAL image bounds,
3. scatter-accumulates into the extended block, then sends halo
   accumulator rows back to the owning neighbors (reverse ppermute + add),
4. normalizes its own rows.

This reproduces the single-chip dense kernel exactly (tests assert
equality), with communication proportional to the halo, riding ICI.
The batch axis is sharded over 'dp' with a local vmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..core.nlkalman import _dense_pass, patch_validity, _auto_chunk
from ..core.engine import dense_pass_v2, auto_rows_per_block
from ..params import NLKParams


def _shift_up(x, axis_name):
    """Return neighbor i+1's block bottom... i.e. receive from next device."""
    n = jax.lax.psum(1, axis_name)
    perm = [(i + 1, i) for i in range(n - 1)]
    return jax.lax.ppermute(x, axis_name, perm)


def _shift_down(x, axis_name):
    """Receive from previous device (edge gets zeros)."""
    n = jax.lax.psum(1, axis_name)
    perm = [(i, i + 1) for i in range(n - 1)]
    return jax.lax.ppermute(x, axis_name, perm)


def _halo_extend(x, halo, axis_name):
    """(rows, ...) local block -> (rows + 2*halo, ...) with neighbor halos."""
    top = _shift_down(x[-halo:], axis_name)    # prev shard's bottom rows
    bot = _shift_up(x[:halo], axis_name)       # next shard's top rows
    return jnp.concatenate([top, x, bot], axis=0)


def _halo_fold(acc, halo, axis_name):
    """Send halo accumulator rows to their owners; returns own-rows block."""
    own = acc[halo:-halo]
    from_prev = _shift_down(acc[-halo:], axis_name)  # prev's bottom-halo acc
    from_next = _shift_up(acc[:halo], axis_name)     # next's top-halo acc
    own = own.at[:halo].add(from_prev)
    own = own.at[-halo:].add(from_next)
    return own


def _sharded_pass_body(
    cur, prev, pvalid, basic, sigma, prms, mode, has_prev, has_basic,
    chunk_sites, halo, global_h, axis_name, engine="v2",
):
    """shard_map body: cur/prev/pvalid/basic are local (block, W, ...) rows."""
    psz = prms.patch_sz
    step = psz // 2
    block = cur.shape[0]
    idx = jax.lax.axis_index(axis_name)
    g0 = idx * block

    cur_e = _halo_extend(cur, halo, axis_name)
    basic_e = _halo_extend(basic, halo, axis_name) if has_basic else cur_e
    if has_prev:
        prev_e = _halo_extend(prev, halo, axis_name)
        pval_e = _halo_extend(pvalid.astype(jnp.float32), halo, axis_name) > 0.5
    else:
        prev_e = jnp.zeros_like(cur_e)
        pval_e = jnp.zeros(cur_e.shape[:2], bool)

    hh_g = global_h - psz + 1
    # local patch coord <-> global: global = local + g0 - halo
    qy_lo = halo - g0                 # local coord of global patch row 0
    qy_hi = hh_g + halo - g0          # one past last valid local patch row
    qy_bounds = jnp.stack([qy_lo, qy_hi]).astype(jnp.int32)

    if engine == "pallas":
        # fused kernel on the sharded path: each shard runs the same
        # one-kernel pass over its halo-extended block, gated to its own
        # site rows (site_rows) and the GLOBAL patch-row bounds
        # (qy_bounds); interpret mode on non-TPU meshes (CPU tests)
        import os

        from ..core.engine_pallas import dense_pass_pallas

        out_e, agg_e = dense_pass_pallas(
            cur_e, prev_e, pval_e, basic_e, sigma, prms, mode,
            has_prev, has_basic, return_accum=True,
            window_dtype=os.environ.get("BNLK_WINDOW_DTYPE", "float32"),
            interpret=jax.default_backend() != "tpu",
            site_rows=(halo // step, (halo + block) // step),
            qy_bounds=qy_bounds,
        )
    elif engine == "v2":
        # halo is step-aligned, so local site rows stay on the global
        # stride-psz/2 grid
        out_e, agg_e = dense_pass_v2(
            cur_e, prev_e, pval_e, basic_e, sigma, prms, mode,
            has_prev, has_basic,
            auto_rows_per_block(cur.shape[1], cur.shape[2], psz,
                                prms.search_sz_x if mode == "filter"
                                else prms.search_sz_t),
            site_rows=(halo // step, (halo + block) // step),
            qy_bounds=qy_bounds, return_accum=True,
        )
    else:
        out_e, agg_e = _dense_pass(
            cur_e, prev_e, pval_e, basic_e, sigma, prms, mode,
            has_prev, has_basic, chunk_sites,
            site_rows=(halo, halo + block), qy_bounds=qy_bounds,
            return_accum=True,
        )
    out = _halo_fold(out_e, halo, axis_name)
    agg = _halo_fold(agg_e, halo, axis_name)
    covered = agg > 1e-6
    return jnp.where(covered[..., None], out / jnp.maximum(agg, 1e-6)[..., None], cur)


def resolve_engine(local_h, w, ch, prms, mode):
    """The 'auto' per-shard engine dispatch, exposed so callers (and the
    driver dryrun) can report the engine that will ACTUALLY run: the
    fused Pallas kernel on real TPU shards when its VMEM plan fits the
    halo-extended block; v2 elsewhere (CPU meshes keep the fast compiled
    path — pallas interpret is for parity tests only)."""
    import os

    try:
        if jax.default_backend() == "tpu":
            from ..core.engine_pallas import pallas_pass_supported

            if pallas_pass_supported(
                local_h, w, ch, prms, mode,
                window_dtype=os.environ.get("BNLK_WINDOW_DTYPE", "float32"),
            ):
                return "pallas"
    except Exception:  # pragma: no cover - no backend at all
        pass
    return "v2"


@functools.partial(
    jax.jit,
    static_argnames=("sigma", "prms", "mode", "has_prev", "has_basic", "mesh",
                     "chunk_sites", "engine"),
)
def _spatial_pass(
    cur, prev, pvalid, basic, sigma, prms, mode, has_prev, has_basic,
    mesh: Mesh, chunk_sites: int, engine: str = "auto",
):
    """H-sharded NL-Kalman pass.

    Accepts (H, W, C) frames sharded over 'sp', or (B, H, W, C) batches
    sharded over ('dp', 'sp') — the batched form is ONE shard_map over both
    mesh axes with a local vmap inside, so dp x sp sharded inputs flow in
    without any resharding (no involuntary rematerialization).
    """
    batched = cur.ndim == 4
    h, w, ch = cur.shape[1:] if batched else cur.shape
    n_sp = mesh.shape["sp"]
    psz = prms.patch_sz
    step = psz // 2
    rad = max(prms.search_sz_x, prms.search_sz_t) if mode == "filter" else prms.search_sz_t
    # step-aligned halo keeps the sharded site grid on the global stride grid
    halo = -(-(rad + psz) // step) * step
    if h % n_sp:
        raise ValueError(f"H={h} not divisible by sp={n_sp}")
    block = h // n_sp
    if block % step:
        raise ValueError(f"shard block {block} rows not divisible by {step}")
    if block < halo:
        raise ValueError(f"shard block {block} rows < halo {halo}; reduce sp")

    if engine == "auto":
        engine = resolve_engine(block + 2 * halo, w, ch, prms, mode)

    body = functools.partial(
        _sharded_pass_body, sigma=sigma, prms=prms, mode=mode,
        has_prev=has_prev, has_basic=has_basic, chunk_sites=chunk_sites,
        halo=halo, global_h=h, axis_name="sp", engine=engine,
    )
    if batched:
        if cur.shape[0] % mesh.shape["dp"]:
            raise ValueError(
                f"batch {cur.shape[0]} not divisible by dp={mesh.shape['dp']}")
        fn = shard_map(
            jax.vmap(lambda c, p, v, b: body(c, p, v, b)),
            mesh=mesh,
            in_specs=(P("dp", "sp"), P("dp", "sp"), P("dp", "sp"), P("dp", "sp")),
            out_specs=P("dp", "sp"),
            # pallas_call out_shapes carry no varying-mesh-axes info
            check_vma=False,
        )
    else:
        fn = shard_map(
            lambda c, p, v, b: body(c, p, v, b),
            mesh=mesh,
            in_specs=(P("sp"), P("sp"), P("sp"), P("sp")),
            out_specs=P("sp"),
            check_vma=False,
        )
    return fn(cur, prev, pvalid, basic)


def spatial_filter_frame(
    nisy, deno0, prev_valid, bsic1, sigma, prms: NLKParams, mesh: Mesh,
    chunk_sites: int | None = None,
):
    """H-sharded nlkalman_filter_frame; semantics identical to the
    single-chip kernel (OPP-space inputs)."""
    has_prev = deno0 is not None
    has_basic = bsic1 is not None
    h, w, ch = nisy.shape
    if prev_valid is None:
        prev_valid = jnp.ones((h, w), bool) if has_prev else jnp.zeros((h, w), bool)
    deno0 = jnp.zeros_like(nisy) if deno0 is None else jnp.where(prev_valid[..., None], deno0, 0.0)
    basic = bsic1 if has_basic else nisy
    if chunk_sites is None:
        chunk_sites = _auto_chunk(h // mesh.shape["sp"], w, ch, prms.patch_sz, prms.search_sz_x)
    return _spatial_pass(
        nisy, deno0, prev_valid, basic, float(sigma), prms, "filter",
        has_prev, has_basic, mesh, chunk_sites,
    )


def spatial_smooth_frame(
    filt1, smoo0, prev_valid, sigma, prms: NLKParams, mesh: Mesh,
    chunk_sites: int | None = None,
):
    """H-sharded nlkalman_smooth_frame."""
    has_prev = smoo0 is not None
    h, w, ch = filt1.shape
    if prev_valid is None:
        prev_valid = jnp.ones((h, w), bool) if has_prev else jnp.zeros((h, w), bool)
    smoo0 = jnp.zeros_like(filt1) if smoo0 is None else jnp.where(prev_valid[..., None], smoo0, 0.0)
    if chunk_sites is None:
        chunk_sites = _auto_chunk(h // mesh.shape["sp"], w, ch, prms.patch_sz, prms.search_sz_t)
    return _spatial_pass(
        filt1, smoo0, prev_valid, filt1, float(sigma), prms, "smooth",
        has_prev, False, mesh, chunk_sites,
    )


def sharded_filter_step(mesh: Mesh, sigma: float, p1: NLKParams, p2: NLKParams):
    """Build a jitted batched two-pass filter step over a ('dp','sp') mesh.

    Returns step(noisy, flt1_prev, flt2_prev, flow, occ) -> (flt1, flt2)
    for (B, H, W, C) batches: batch sharded over 'dp', rows over 'sp'.
    Flow/warp/color are auto-partitioned by GSPMD; the NL-Kalman passes run
    under shard_map with explicit halo exchange.
    """
    from ..ops.color import rgb2opp, opp2rgb
    from ..ops.warp import warp_bicubic_nan
    from jax.sharding import NamedSharding

    # dp x sp layout everywhere: batch over 'dp', rows over 'sp'.  The
    # NL-Kalman passes consume this layout directly (batched shard_map), so
    # no resharding/rematerialization happens at the shard_map boundary.
    sharding = NamedSharding(mesh, P("dp", "sp", None, None))

    @jax.jit
    def step(noisy, flt1_prev, flt2_prev, flow, occ):
        noisy, flt1_prev, flt2_prev = (
            jax.lax.with_sharding_constraint(x, sharding)
            for x in (noisy, flt1_prev, flt2_prev))
        n_opp = rgb2opp(noisy)
        w1, v1 = jax.vmap(warp_bicubic_nan)(rgb2opp(flt1_prev), flow, occ)
        f11 = _spatial_pass(
            n_opp, jnp.where(v1[..., None], w1, 0.0), v1, n_opp,
            float(sigma), p1, "filter", True, False, mesh,
            _auto_chunk(noisy.shape[1] // mesh.shape["sp"], noisy.shape[2],
                        noisy.shape[3], p1.patch_sz, p1.search_sz_x),
        )
        w2, v2 = jax.vmap(warp_bicubic_nan)(rgb2opp(flt2_prev), flow, occ)
        f21 = _spatial_pass(
            n_opp, jnp.where(v2[..., None], w2, 0.0), v2, f11,
            float(sigma), p2, "filter", True, True, mesh,
            _auto_chunk(noisy.shape[1] // mesh.shape["sp"], noisy.shape[2],
                        noisy.shape[3], p2.patch_sz, p2.search_sz_x),
        )
        return opp2rgb(f11), opp2rgb(f21)

    return step

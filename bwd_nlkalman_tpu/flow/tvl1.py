"""TPU-native TV-L1 optical flow.

Re-designs the duality-based TV-L1 solver of the reference
(Dual_TVL1_optic_flow, lib/tvl1flow/tvl1flow_lib.c:93-275; multiscale
driver :345-474) as jitted fixed-point iterations:

- the primal-dual inner loop is a lax.while_loop with the reference's
  convergence test (mean squared update < epsilon^2) AND iteration cap
  (MAX_ITERATIONS = 300, tvl1flow_lib.c:24) — identical stopping rule,
  static shapes;
- warps, gradients, divergence, Gaussian pyramid use the ops/ layer, each
  reproducing the reference's exact boundary conventions;
- the pyramid is coarse-to-fine with zoom 0.5 and flow upscaling 1/zfactor
  (:410-455), including the `fscale` early stop used by the denoising
  scripts to run flow at half resolution (scripts/nlkalman-seq.sh:12,51).

Every scale level is a separate jit (static shapes per level); the whole
pyramid runs on device with no host round trips.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

from ..ops.gaussian import gaussian_blur
from ..ops.grad import centered_gradient, forward_gradient, divergence
from ..ops.warp import warp_bicubic_zero, warp_bicubic_zero_multi, build_taps16
from ..ops.zoom import zoom_out, zoom_in, zoom_size

MAX_ITERATIONS = 300          # tvl1flow_lib.c:24
PRESMOOTHING_SIGMA = 0.8      # tvl1flow_lib.c:25
GRAD_IS_ZERO = 1e-10          # tvl1flow_lib.c:26

DEFAULTS = dict(tau=0.25, lambda_=0.15, theta=0.3, nscales=100,
                fscale=0, zfactor=0.5, nwarps=5, epsilon=0.01)


def luma(img: jnp.ndarray) -> jnp.ndarray:
    """Rec.601 luma, matching iio's uncolorize (lib/iio/iio.c:1029-1060).

    (H, W, C) or (H, W) -> (H, W).
    """
    if img.ndim == 2:
        return img
    if img.shape[-1] == 1:
        return img[..., 0]
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return img[..., :3] @ w


@functools.partial(jax.jit, static_argnames=(
    "tau", "theta", "nwarps", "epsilon", "check_every"))
def tvl1_flow_single_scale(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    u_init: jnp.ndarray,
    tau: float = 0.25,
    lambda_: float = 0.15,
    theta: float = 0.3,
    nwarps: int = 5,
    epsilon: float = 0.01,
    check_every: int = 10,
    max_iters: int = MAX_ITERATIONS,
) -> jnp.ndarray:
    """One-scale TV-L1 (Dual_TVL1_optic_flow, tvl1flow_lib.c:93-275).

    i0, i1: (H, W) float; u_init: (H, W, 2).  Returns (H, W, 2).

    `check_every` amortizes the sequential-overhead of the convergence
    test: the primal-dual step runs in groups of `check_every` iterations
    between error checks (the reference checks every iteration,
    tvl1flow_lib.c:165; running a few extra steps past the stopping point
    only brings the iterate closer to the fixed point).
    """
    h, w = i0.shape
    size = h * w
    # f32 product like the C float l_t (tvl1flow_lib.c:129) — also makes
    # a traced lambda_ bit-identical to the same static value
    l_t = jnp.asarray(lambda_, jnp.float32) * jnp.float32(theta)
    taut = tau / theta

    i1x, i1y = centered_gradient(i1)
    u1, u2 = u_init[..., 0], u_init[..., 1]
    p = jnp.zeros((4, h, w), i0.dtype)  # p11, p12, p21, p22
    i1s = jnp.stack([i1, i1x, i1y], axis=-1)
    i1s_taps = build_taps16(i1s)   # flow-independent; shared by all warps

    def warp_stage(carry, _):
        u1, u2, p = carry
        wrp = warp_bicubic_zero_multi(i1s, u1, u2, taps=i1s_taps)
        i1w, i1wx, i1wy = wrp[..., 0], wrp[..., 1], wrp[..., 2]
        grad = i1wx * i1wx + i1wy * i1wy
        rho_c = i1w - i1wx * u1 - i1wy * u2 - i0

        def cond(state):
            _, _, _, err, n = state
            return (err > epsilon * epsilon) & (n < max_iters)

        def one_step(u1, u2, p):
            rho = rho_c + i1wx * u1 + i1wy * u2
            # thresholding operator TH (tvl1flow_lib.c:170-205)
            fi = jnp.where(grad < GRAD_IS_ZERO, 0.0, -rho / jnp.maximum(grad, GRAD_IS_ZERO))
            d1 = jnp.where(
                rho < -l_t * grad, l_t * i1wx,
                jnp.where(rho > l_t * grad, -l_t * i1wx, fi * i1wx),
            )
            d2 = jnp.where(
                rho < -l_t * grad, l_t * i1wy,
                jnp.where(rho > l_t * grad, -l_t * i1wy, fi * i1wy),
            )
            v1 = u1 + d1
            v2 = u2 + d2
            # u update + error (tvl1flow_lib.c:208-229)
            div_p1 = divergence(p[0], p[1])
            div_p2 = divergence(p[2], p[3])
            u1n = v1 + theta * div_p1
            u2n = v2 + theta * div_p2
            err = (jnp.sum((u1n - u1) ** 2) + jnp.sum((u2n - u2) ** 2)) / size
            # dual ascent (tvl1flow_lib.c:232-245)
            u1x, u1y = forward_gradient(u1n)
            u2x, u2y = forward_gradient(u2n)
            g1 = jnp.hypot(u1x, u1y)
            g2 = jnp.hypot(u2x, u2y)
            ng1 = 1.0 + taut * g1
            ng2 = 1.0 + taut * g2
            pn = jnp.stack(
                [
                    (p[0] + taut * u1x) / ng1,
                    (p[1] + taut * u1y) / ng1,
                    (p[2] + taut * u2x) / ng2,
                    (p[3] + taut * u2y) / ng2,
                ]
            )
            return u1n, u2n, pn, err

        def body(state):
            u1, u2, p, _, n = state
            err = jnp.asarray(jnp.inf, i0.dtype)
            for _ in range(check_every):
                u1, u2, p, err = one_step(u1, u2, p)
            return u1, u2, p, err, n + check_every

        u1, u2, p, _, _ = jax.lax.while_loop(
            cond, body, (u1, u2, p, jnp.asarray(jnp.inf, i0.dtype), 0)
        )
        return (u1, u2, p), None

    (u1, u2, p), _ = jax.lax.scan(warp_stage, (u1, u2, p), None, length=nwarps)
    return jnp.stack([u1, u2], axis=-1)


def _normalize_pair(i0, i1):
    """Joint [0,255] normalization (image_normalization, tvl1flow_lib.c:303-337)."""
    mx = jnp.maximum(i0.max(), i1.max())
    mn = jnp.minimum(i0.min(), i1.min())
    den = mx - mn
    scale = jnp.where(den > 0, 255.0 / jnp.maximum(den, 1e-30), 1.0)
    off = jnp.where(den > 0, mn, 0.0)
    return (i0 - off) * scale, (i1 - off) * scale


def num_scales(w: int, h: int, nscales: int, zfactor: float) -> int:
    """Auto scale count so the coarsest level is >= 16 px (main.c:159-163)."""
    n = int(1 + math.log(math.hypot(w, h) / 16.0) / math.log(1.0 / zfactor))
    return max(1, min(nscales, n))


def _use_pallas_backend(backend: str) -> bool:
    if backend == "xla":
        return False
    if backend == "pallas":
        return True
    # auto: fused kernel on TPU backends only
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def _prep_pair(i0, i1):
    """Luma + joint normalization + presmooth (tvl1flow_lib.c:382-386)."""
    i0 = luma(jnp.asarray(i0, jnp.float32))
    i1 = luma(jnp.asarray(i1, jnp.float32))
    i0n, i1n = _normalize_pair(i0, i1)
    return (
        gaussian_blur(i0n, PRESMOOTHING_SIGMA),
        gaussian_blur(i1n, PRESMOOTHING_SIGMA),
    )


def _solve_level(a, b, u, *, tau, lambda_, theta, nwarps, epsilon,
                 max_iters, use_pallas):
    """Single-scale solve dispatch (fused kernel / tiled kernel / XLA)."""
    if use_pallas:
        from .tvl1_pallas import tvl1_single_scale_pallas
        from .tvl1_fused import tvl1_single_scale_fused, fused_level_supported

        if fused_level_supported(*a.shape):
            # whole-level fused kernel (warp + all iterations in one
            # launch) — the per-launch overhead dominates every level.
            # Coarse levels check convergence less often: the
            # while-round boundary (err reduce + state flush) is the
            # dominant fixed cost when planes are tiny, and running a
            # few iterations past the stopping point only brings the
            # iterate closer to the fixed point.
            npx = a.shape[0] * a.shape[1]
            k_check = int(os.environ.get(
                "BNLK_TVL1_KC_FINE" if npx > 200_000
                else "BNLK_TVL1_KC_COARSE",
                "8" if npx > 200_000 else "24"))
            return tvl1_single_scale_fused(
                a, b, u, tau=tau, lambda_=lambda_, theta=theta,
                nwarps=nwarps, epsilon=epsilon, k_check=k_check,
                max_iters=max_iters,
                state_dtype=os.environ.get(
                    "BNLK_TVL1_STATE_DTYPE", "float32"),
            )
        if isinstance(lambda_, jax.core.Tracer):
            # the tiled fallback kernel bakes lambda in at compile
            # time; levels beyond the fused plan can't sweep it
            raise ValueError(
                "traced lambda_ requires the fused TV-L1 backend "
                f"(level {a.shape} exceeds its VMEM plan); pass a "
                "python float or reduce the level size/fscale"
            )
        return tvl1_single_scale_pallas(
            a, b, u, tau=tau, lambda_=lambda_, theta=theta,
            nwarps=nwarps, epsilon=epsilon,
            max_iterations=max_iters,
        )
    return tvl1_flow_single_scale(
        a, b, u, tau=tau, lambda_=lambda_, theta=theta,
        nwarps=nwarps, epsilon=epsilon, max_iters=max_iters,
    )


def _upsample_chain(u, sizes, s_from, zfactor):
    """Zoom the flow from level s_from up to level 0 (tvl1flow_lib.c:427-455)."""
    for s in range(s_from, 0, -1):
        nw, nh = sizes[s - 1]
        u = jnp.stack(
            [zoom_in(u[..., 0], nw, nh), zoom_in(u[..., 1], nw, nh)], axis=-1
        ) * (1.0 / zfactor)
    return u


def flow_carry_shape(h: int, w: int, nscales: int = 100, fscale: int = 0,
                     zfactor: float = 0.5) -> tuple[int, int, int]:
    """Static shape of the level-`fscale` flow carried by the warm-start
    streaming drivers: (h_fs, w_fs, 2)."""
    ns = num_scales(w, h, nscales, zfactor)
    fs = min(fscale, ns)
    cw, ch_ = w, h
    for _ in range(fs):
        cw, ch_ = zoom_size(cw, ch_, zfactor)
    return (ch_, cw, 2)


def tvl1_flow(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    tau: float = 0.25,
    lambda_: float = 0.15,
    theta: float = 0.3,
    nscales: int = 100,
    fscale: int = 0,
    zfactor: float = 0.5,
    nwarps: int = 5,
    epsilon: float = 0.01,
    backend: str = "auto",
    max_iters: int | None = None,
    return_carry: bool = False,
):
    """Multiscale TV-L1 flow from i0 to i1 (both (H, W) or (H, W, C)).

    Color inputs are converted with Rec.601 luma first, like the reference
    CLI.  Mirrors Dual_TVL1_optic_flow_multiscale (tvl1flow_lib.c:345-474)
    including fscale early stop with pure upsampling of the coarser flow.
    Returns (H, W, 2) float32; with return_carry=True also the
    level-`fscale` flow (the warm-start carry for tvl1_flow_warm).
    """
    if max_iters is None:
        max_iters = int(os.environ.get("BNLK_TVL1_MAXIT", str(MAX_ITERATIONS)))
    i0 = luma(jnp.asarray(i0, jnp.float32))
    i1 = luma(jnp.asarray(i1, jnp.float32))
    h, w = i0.shape
    ns = num_scales(w, h, nscales, zfactor)
    fs = min(fscale, ns)

    i0n, i1n = _prep_pair(i0, i1)

    # build pyramid (zoom_out by zfactor per level)
    pyr = [(i0n, i1n)]
    sizes = [(w, h)]
    for s in range(1, ns):
        pw, ph = sizes[-1]
        nw, nh = zoom_size(pw, ph, zfactor)
        a, b = pyr[-1]
        pyr.append((zoom_out(a, zfactor), zoom_out(b, zfactor)))
        sizes.append((nw, nh))

    use_pallas = _use_pallas_backend(backend)
    solve = functools.partial(
        _solve_level, tau=tau, lambda_=lambda_, theta=theta, nwarps=nwarps,
        epsilon=epsilon, max_iters=max_iters, use_pallas=use_pallas,
    )

    cw, ch_ = sizes[ns - 1]
    u = jnp.zeros((ch_, cw, 2), jnp.float32)
    u_fs = u
    for s in range(ns - 1, -1, -1):
        if s >= fs:
            a, b = pyr[s]
            u = solve(a, b, u)
            if s == fs:
                u_fs = u
        if s == 0:
            break
        nw, nh = sizes[s - 1]
        u = jnp.stack(
            [zoom_in(u[..., 0], nw, nh), zoom_in(u[..., 1], nw, nh)], axis=-1
        ) * (1.0 / zfactor)
    if return_carry:
        return u, u_fs
    return u


def warm_gate_ok(a, b, u0):
    """Residual gate predicate for the warm-start carry.

    Residuals are computed over the IN-FRAME valid footprint only: the
    zero-fill warp puts |a| itself into the residual over the border band
    that the carry pushes out of frame, which would inflate r_warm for ANY
    nonzero carry and false-trip the gate on good carries.  The mask
    reproduces warp_bicubic_zero's own out-flag (floor-based 4x4 footprint
    leaving the frame) and is applied to BOTH sides; a carry that evicts
    most of the frame is stale by construction.

    a, b: prepped level-fscale images; u0: (h, w, 2) carry.
    Returns (ok, r_warm, r_zero).
    """
    hh, ww = a.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(hh, dtype=jnp.float32),
        jnp.arange(ww, dtype=jnp.float32), indexing="ij")
    bx = jnp.floor(xx + u0[..., 0]).astype(jnp.int32) - 1
    by = jnp.floor(yy + u0[..., 1]).astype(jnp.int32) - 1
    valid = ((bx >= 0) & (bx + 3 < ww) & (by >= 0) & (by + 3 < hh)
             ).astype(jnp.float32)
    n = jnp.maximum(valid.sum(), 1.0)
    bw = warp_bicubic_zero(b, u0[..., 0], u0[..., 1])
    r_warm = jnp.sum(jnp.abs(a - bw) * valid) / n
    r_zero = jnp.sum(jnp.abs(a - b) * valid) / n
    ok = (r_warm <= r_zero) & (valid.sum() >= 0.5 * hh * ww)
    return ok, r_warm, r_zero


def tvl1_flow_warm(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    u_carry: jnp.ndarray,
    tau: float = 0.25,
    lambda_: float = 0.15,
    theta: float = 0.3,
    nscales: int = 100,
    fscale: int = 0,
    zfactor: float = 0.5,
    nwarps: int = 5,
    epsilon: float = 0.01,
    backend: str = "auto",
    max_iters: int | None = None,
    gate: bool = True,
    warm_nwarps: int | None = None,
    warm_max_iters: int | None = None,
):
    """Warm-started streaming TV-L1: solve ONLY the level-`fscale` scale,
    initialized from the previous scan step's level-`fscale` flow.

    TPU-first deviation from the reference driver (which re-solves the
    whole pyramid from zero for every frame pair,
    tvl1flow_lib.c:345-474): in a video the flow field evolves slowly, so
    the previous frame's solution replaces the coarse-to-fine
    initialization — the nwarps warp stages re-linearize around it and
    absorb frame-to-frame motion changes.  The stopping rule, solver and
    upsample chain are the reference's own; only the INITIAL ITERATE
    differs, and the fixed point it converges to is parameter-identical.
    PSNR-gated: tools/flow_warm_gate.py.

    With `gate=True` (default) the carry is RESIDUAL-GATED: the mean
    L1 data residual of i1 warped by the carry is compared against the
    zero-flow residual at the fscale level, and when the carry does not
    align at least as well as the identity (a scene cut, a motion
    reversal — any stale carry) a `lax.cond` falls back to the full
    cold coarse-to-fine pyramid for that frame.  The gate costs one
    bicubic warp + two reductions at the fscale level; the cold branch
    executes only when taken.  Ungated warm start loses >1 dB on the
    motion-reversal scene (tools/flow_warm_gate.py `cut` config); gated
    it matches the cold pipeline there by construction.

    u_carry: (h_fs, w_fs, 2) from flow_carry_shape / a previous call.
    Returns (flow_full (H, W, 2), u_fs_new).
    """
    if max_iters is None:
        max_iters = int(os.environ.get("BNLK_TVL1_MAXIT", str(MAX_ITERATIONS)))
    i0 = luma(jnp.asarray(i0, jnp.float32))
    i1 = luma(jnp.asarray(i1, jnp.float32))
    h, w = i0.shape
    ns = num_scales(w, h, nscales, zfactor)
    fs = min(fscale, ns)

    a, b = _prep_pair(i0, i1)
    sizes = [(w, h)]
    for _ in range(fs):
        pw, ph = sizes[-1]
        sizes.append(zoom_size(pw, ph, zfactor))
        a, b = zoom_out(a, zfactor), zoom_out(b, zfactor)

    use_pallas = _use_pallas_backend(backend)
    solve = functools.partial(
        _solve_level, tau=tau, lambda_=lambda_, theta=theta, nwarps=nwarps,
        epsilon=epsilon, max_iters=max_iters, use_pallas=use_pallas,
    )
    # the warm branch may run at REDUCED effort (a converged carry needs
    # fewer re-linearizations than a zero iterate; PSNR-gated via
    # tools/flow_warm_gate.py); the cold fallback keeps full effort
    solve_warm = functools.partial(
        _solve_level, tau=tau, lambda_=lambda_, theta=theta,
        nwarps=nwarps if warm_nwarps is None else warm_nwarps,
        epsilon=epsilon,
        max_iters=max_iters if warm_max_iters is None else warm_max_iters,
        use_pallas=use_pallas,
    )

    def _warm(u0):
        return solve_warm(a, b, u0)

    def _cold(u0):
        # full coarse-to-fine below the fscale level, exactly like
        # tvl1_flow (levels < fs are never solved there either)
        del u0
        pyr = [(a, b)]
        cs = [sizes[-1]]
        for _ in range(fs + 1, ns):
            pa, pb = pyr[-1]
            pyr.append((zoom_out(pa, zfactor), zoom_out(pb, zfactor)))
            cs.append(zoom_size(*cs[-1], zfactor))
        cw, ch_ = cs[-1]
        u = jnp.zeros((ch_, cw, 2), jnp.float32)
        for s in range(len(pyr) - 1, -1, -1):
            u = solve(*pyr[s], u)
            if s == 0:
                break
            nw, nh = cs[s - 1]
            u = jnp.stack(
                [zoom_in(u[..., 0], nw, nh), zoom_in(u[..., 1], nw, nh)],
                axis=-1,
            ) * (1.0 / zfactor)
        return u

    u0 = u_carry.astype(jnp.float32)
    if gate:
        ok, _, _ = warm_gate_ok(a, b, u0)
        u_fs = jax.lax.cond(ok, _warm, _cold, u0)
    else:
        u_fs = _warm(u0)
    return _upsample_chain(u_fs, sizes, fs, zfactor), u_fs


def warm_gate_probe(
    i0, i1, u_carry,
    fscale: int = 0, zfactor: float = 0.5, nscales: int = 100,
):
    """Evaluate the SAME residual gate tvl1_flow_warm applies, standalone.

    Reproduces the warm path's image prep (joint normalization, presmooth,
    zoom chain to the fscale level) and returns (ok, r_warm, r_zero) for
    the given carry — so a driver/dryrun can assert which lax.cond branch
    a warm scan step actually took, instead of asserting code it never ran.
    """
    i0 = luma(jnp.asarray(i0, jnp.float32))
    i1 = luma(jnp.asarray(i1, jnp.float32))
    h, w = i0.shape
    ns = num_scales(w, h, nscales, zfactor)
    fs = min(fscale, ns)
    a, b = _prep_pair(i0, i1)
    for _ in range(fs):
        a, b = zoom_out(a, zfactor), zoom_out(b, zfactor)
    return warm_gate_ok(a, b, u_carry.astype(jnp.float32))


def flow_energy(i0, i1, flow, lambda_: float = 0.15) -> jnp.ndarray:
    """TV-L1 energy (energy_optic_flow, tvl1flow_lib.c:43-85) — test oracle."""
    i0 = luma(jnp.asarray(i0, jnp.float32))
    i1 = luma(jnp.asarray(i1, jnp.float32))
    u1, u2 = flow[..., 0], flow[..., 1]
    i1w = warp_bicubic_zero(i1, u1, u2)
    diff = jnp.abs(i1w - i0)
    u1x, u1y = forward_gradient(u1)
    u2x, u2y = forward_gradient(u2)
    # NOTE the reference sums |u1x|+|u1y| only (u2 gradients computed but
    # unused, tvl1flow_lib.c:70-77) — we keep the full TV for a meaningful
    # oracle and document the difference.
    tv = jnp.abs(u1x) + jnp.abs(u1y) + jnp.abs(u2x) + jnp.abs(u2y)
    return jnp.mean(tv + lambda_ * diff)

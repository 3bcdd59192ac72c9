"""Training fixtures: precomputed noisy frames, flow and occlusions.

The reference's training economy rests on per-(sequence, sigma) fixtures
computed ONCE and reused across every parameter trial: noisy frames are
written to disk, TV-L1 flow runs between consecutive NOISY frames, and
occlusion masks are derived from the flow divergence
(scripts/dev-scripts/tvl1flow-seq.sh:26-79, consumed by
nlkalman-train.sh:17-28).  Without this, the flow — which does not
depend on the denoiser parameters being searched — dominates every
trial's wall clock.

Flow parameters mirror the training script's tvl1flow invocation
(tvl1flow-seq.sh:39: tau .25, lambda .2, theta .3, nscales 100,
fscale 1, zfactor .5, nwarps 5, epsilon .01); the first/last frame
copies its neighbour's flow (:43, :66).
"""

from __future__ import annotations

import dataclasses
import hashlib
import os

import numpy as np


@dataclasses.dataclass
class Fixtures:
    """Per-(sequence, sigma) training fixtures (all numpy, host-side)."""

    noisy: np.ndarray          # (T, H, W, C)
    bflow: np.ndarray          # (T, H, W, 2) flow t -> t-1; [0] copies [1]
    bocc: np.ndarray           # (T, H, W)    255 = occluded
    fflow: np.ndarray | None   # (T, H, W, 2) flow t -> t+1; [-1] copies [-2]
    focc: np.ndarray | None


def make_fixtures(
    clean: np.ndarray,
    sigma: float,
    seeds,
    directions: str = "all",       # "bwd" | "fwd" | "all" (tvl1flow-seq.sh $5)
    fscale: int = 1,
    lambda_: float = 0.2,
    occ_threshold: float = 0.75,
) -> Fixtures:
    """Compute fixtures for one clean sequence (T, H, W, C)."""
    import jax.numpy as jnp

    from ..flow import tvl1_flow, occlusion_mask
    from ..flow.tvl1 import luma
    from ..pipeline.gt import add_noise_sequence

    clean = np.asarray(clean, np.float32)
    t = clean.shape[0]
    noisy = add_noise_sequence(clean, sigma, seeds)
    lum = [jnp.asarray(luma(jnp.asarray(noisy[i]))) for i in range(t)]

    def flow_to(i, j):
        u = tvl1_flow(lum[i], lum[j], lambda_=lambda_, fscale=fscale)
        return np.asarray(u), np.asarray(occlusion_mask(u, occ_threshold))

    bflow = bocc = fflow = focc = None
    if directions in ("bwd", "all"):
        bflow = np.zeros(clean.shape[:3] + (2,), np.float32)
        bocc = np.zeros(clean.shape[:3], np.float32)
        for i in range(1, t):
            bflow[i], bocc[i] = flow_to(i, i - 1)
        bflow[0], bocc[0] = bflow[1], bocc[1]      # tvl1flow-seq.sh:43
    if directions in ("fwd", "all"):
        fflow = np.zeros(clean.shape[:3] + (2,), np.float32)
        focc = np.zeros(clean.shape[:3], np.float32)
        for i in range(t - 1):
            fflow[i], focc[i] = flow_to(i, i + 1)
        fflow[t - 1], focc[t - 1] = fflow[t - 2], focc[t - 2]
    return Fixtures(noisy, bflow, bocc, fflow, focc)


def _cache_key(name: str, clean: np.ndarray, sigma: float, seeds,
               directions: str, fscale: int, lambda_: float,
               occ_threshold: float) -> str:
    h = hashlib.sha1()
    h.update(np.ascontiguousarray(clean[0]).tobytes()[:4096])
    h.update(repr((clean.shape, float(sigma), tuple(int(s) for s in seeds),
                   directions, fscale, lambda_, occ_threshold)).encode())
    return f"{name}_s{sigma:g}_{h.hexdigest()[:12]}"


def cached_fixtures(
    cache_dir: str,
    name: str,
    clean: np.ndarray,
    sigma: float,
    seeds,
    directions: str = "all",
    fscale: int = 1,
    lambda_: float = 0.2,
    occ_threshold: float = 0.75,
) -> Fixtures:
    """Disk-cached :func:`make_fixtures` (the `if [ ! -f $file ]` reuse
    of tvl1flow-seq.sh:35,48).  Key = content + every flow parameter."""
    os.makedirs(cache_dir, exist_ok=True)
    key = _cache_key(name, np.asarray(clean, np.float32), sigma, seeds,
                     directions, fscale, lambda_, occ_threshold)
    path = os.path.join(cache_dir, key + ".npz")
    if os.path.exists(path):
        z = np.load(path)
        return Fixtures(
            z["noisy"],
            z["bflow"] if "bflow" in z else None,
            z["bocc"] if "bocc" in z else None,
            z["fflow"] if "fflow" in z else None,
            z["focc"] if "focc" in z else None,
        )
    fx = make_fixtures(clean, sigma, seeds, directions, fscale, lambda_,
                       occ_threshold)
    arrs = {"noisy": fx.noisy}
    for k in ("bflow", "bocc", "fflow", "focc"):
        v = getattr(fx, k)
        if v is not None:
            arrs[k] = v
    np.savez(path, **arrs)
    return fx

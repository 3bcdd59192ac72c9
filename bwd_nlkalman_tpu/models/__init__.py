"""Model families — the denoising "models" this framework ships.

The reference's model zoo is its set of trained operating points and
pipeline variants (scripts/*.sh drivers x the TRAIN14 sigma-
parameterized defaults, src/nlkalman.c:426-487 — the shipped
"weights").  Besides re-exporting the building blocks, this module
provides a small registry: ``get_model(name, sigma)`` returns a
ready-to-run denoiser ``fn(noisy_thwc) -> denoised_thwc`` with the
variant's pipeline and the sigma-resolved parameters baked in.

Variants (matching the reference's installed scripts):

- ``nlk-seq``        nlkalman-seq.sh: 2-pass filter + backward RTS
- ``nlk-flt``        filtering only (SPM=no)
- ``nlk-fsmo``       causal forward smoothing (nlkalman-fsmo-seq.sh)
- ``nlk-lsmo``       lag-1 smoothing (nlkalman-lsmo-seq.sh)
- ``msnlk``          multiscale DCT pyramid (msnlkalman-seq.sh)
- ``msnlk-lz3``      Lanczos-3 pyramid (msnlkalman-lz3-seq.sh)
"""

from __future__ import annotations

from ..core import nlkalman_filter_frame, nlkalman_smooth_frame  # noqa: F401
from ..flow import tvl1_flow, occlusion_mask  # noqa: F401
from ..pipeline import (  # noqa: F401
    denoise_sequence,
    filter_sequence,
    smooth_sequence,
    fsmo_sequence,
    lsmo_sequence,
    denoise_batch,
)
from ..pipeline.multiscale import ms_denoise_sequence  # noqa: F401
from ..params import NLKParams, FilterMode, default_params  # noqa: F401


def _seq(noisy, sigma, flow_cfg):
    return denoise_sequence(noisy, sigma, flow_cfg=flow_cfg)[2]


def _flt(noisy, sigma, flow_cfg):
    return filter_sequence(noisy, sigma, flow_cfg=flow_cfg)[1]


def _fsmo(noisy, sigma, flow_cfg):
    return fsmo_sequence(noisy, sigma, flow_cfg=flow_cfg)[2]


def _lsmo(noisy, sigma, flow_cfg):
    _, flt2 = filter_sequence(noisy, sigma, flow_cfg=flow_cfg)
    return lsmo_sequence(flt2, sigma, flow_cfg=flow_cfg)


def _ms(noisy, sigma, flow_cfg):
    return ms_denoise_sequence(noisy, sigma)[2]


def _ms_lz3(noisy, sigma, flow_cfg):
    from ..pipeline.multiscale import (
        lz3_filter_sequence, lz3_smooth_sequence)

    _, flt2, flt2_levels = lz3_filter_sequence(noisy, sigma)
    return lz3_smooth_sequence(flt2, flt2_levels, sigma)


MODELS = {
    "nlk-seq": _seq,
    "nlk-flt": _flt,
    "nlk-fsmo": _fsmo,
    "nlk-lsmo": _lsmo,
    "msnlk": _ms,
    "msnlk-lz3": _ms_lz3,
}


def get_model(name: str, sigma: float, flow_cfg=None):
    """Return ``fn(noisy_thwc) -> denoised_thwc`` for a registered
    pipeline variant at noise level ``sigma`` (TRAIN14 defaults).

    ``flow_cfg``: optional pipeline.sequence.FlowConfig (e.g. the
    benched warm-started configuration); default = reference OPM.
    """
    if name not in MODELS:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODELS)}")
    from ..pipeline.sequence import FlowConfig

    cfg = flow_cfg or FlowConfig()
    fn = MODELS[name]

    def run(noisy):
        return fn(noisy, float(sigma), cfg)

    run.__name__ = f"{name}_sigma{sigma:g}"
    return run

"""Model families — the denoising "models" this framework ships.

The reference's model zoo is its set of trained operating points and
pipeline variants; this module is the stable facade over them:

- NL-Kalman frame filter / RTS smoother kernels (core/)
- TV-L1 optical flow (flow/)
- pipeline variants: single-scale seq, multiscale (msnlkalman), causal
  fsmo / lag-1 lsmo smoothers, streaming
- the TRAIN14 sigma-parameterized defaults (params.default_params) are
  the shipped "weights" (src/nlkalman.c:426-487)
"""

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

"""Whole-sequence denoising drivers (the TPU-native nlkalman-seq)."""

from .sequence import (  # noqa: F401
    FlowConfig,
    filter_frame_pair,
    filter_sequence,
    smooth_sequence,
    denoise_sequence,
    fsmo_sequence,
    lsmo_sequence,
    denoise_batch,
)
from .gt import add_noise_sequence, sequence_psnr, gt_measures  # noqa: F401

"""Optical flow: TPU-native TV-L1 (Zach-Pock-Bischof) and the divergence
occlusion detector used by the denoising pipeline."""

from .tvl1 import tvl1_flow, tvl1_flow_single_scale, flow_energy, luma  # noqa: F401
from .occlusion import occlusion_mask  # noqa: F401
from .measure import endpoint_error, angular_error, measure_sequence  # noqa: F401

"""Low-level TPU image ops."""

from .color import rgb2opp, opp2rgb  # noqa: F401
from .windows import window_function  # noqa: F401
from .dct import (  # noqa: F401
    dct2_patches,
    idct2_patches,
    patch_dct_matrix,
    dct2_image,
    idct2_image,
    dct_image_all_patches,
)
from .warp import warp_bicubic_nan, bicubic_sample, warp_bicubic_zero  # noqa: F401
from .grad import centered_gradient, forward_gradient, divergence  # noqa: F401
from .gaussian import gaussian_blur  # noqa: F401
from .zoom import zoom_out, zoom_in, zoom_size  # noqa: F401
from .noise import awgn, lcg_knuth_normals  # noqa: F401

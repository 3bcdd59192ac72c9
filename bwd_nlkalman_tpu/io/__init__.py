"""Image/flow I/O — the TPU framework's replacement for the reference's
vendored iio library (lib/iio/iio.c, 4.7k LoC).

Formats actually used by the reference pipeline (lib/iio/iio.c:108-124):

- float TIFF   (filter/smoother frame outputs, *.tif)
- PNG          (input sequences, occlusion masks, archival outputs)
- Middlebury .flo flow fields (reader lib/iio/iio.c:2073, writer :3105)
- PFM          (float images, reader :2048, writer :3124 — note the iio
  reader does NOT flip rows; we reproduce that convention for parity)

`read_image`/`write_image` dispatch on extension like iio does.  A native
C++ codec path (bwd_nlkalman_tpu/native) is used when built; the pure
numpy codecs here are the always-available fallback.
"""

from .codecs import (  # noqa: F401
    read_image,
    write_image,
    read_flo,
    write_flo,
    read_pfm,
    write_pfm,
    read_png,
    write_png,
    read_tiff,
    write_tiff,
)
from .video import FrameSequence, read_video, write_video  # noqa: F401

"""Multi-chip parallelism: device meshes, spatially-sharded frame kernels
with explicit ICI halo exchange, and batch data parallelism.

The reference's only parallelism is OpenMP threads within one frame and
GNU-parallel processes across files (SURVEY.md section 2.7).  The TPU
mapping:

- the OpenMP patch loop        -> the dense site grid (already parallel)
- intra-frame thread sharding  -> H-axis sharding over the 'sp' mesh axis
  via shard_map, with lax.ppermute halo exchange sized by the search
  radius + patch size (search window radius 10, patch 8 => 18-row halos)
- GNU parallel over sequences  -> batch axis sharded over 'dp'
"""

from .mesh import make_mesh  # noqa: F401
from .spatial import (  # noqa: F401
    spatial_filter_frame,
    spatial_smooth_frame,
    sharded_filter_step,
)

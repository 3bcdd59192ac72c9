"""bwd_nlkalman_tpu — TPU-native frame-recursive NL-Kalman video denoising.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
pariasm/bwd-nlkalman ("Kalman filtering of patches for frame-recursive video
denoising", Arias & Morel, NTIRE CVPRW 2019).

The reference is a CPU C pipeline of small binaries glued by bash; this
package is a single coherent TPU framework:

- ``ops``       low-level image ops (color, DCT-as-matmul, warps, gradients,
                Gaussian blur, zoom, windows, exact AWGN reproduction)
- ``models``    the NL-Kalman filter / RTS smoother frame kernels, TV-L1
                optical flow, occlusion masks, multiscale pyramids
- ``pipeline``  whole-sequence drivers (lax.scan over frames), ground-truth
                eval harness
- ``parallel``  jax.sharding meshes; spatially-sharded + batch-parallel
                pipeline via shard_map
- ``io``        PNG/TIFF/FLO/PFM codecs and frame-pattern video readers
                (native C++ fast path + pure-Python fallback)
- ``cli``       command-line tools mirroring the reference binaries
- ``train``     parameter-search harness (random search / coord. descent)
"""

__version__ = "0.1.0"

from . import params as params  # noqa: F401

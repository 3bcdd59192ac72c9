"""`python -m bwd_nlkalman_tpu` — environment and capability report.

Prints the package version, the JAX backend/devices, which engines the
auto-dispatch would pick at common shapes, native-IO availability, and
the command-line tools — a quick smoke check for new installs.
"""

import importlib
import os
import sys


def main(argv=None):
    from . import __version__

    print(f"bwd_nlkalman_tpu {__version__}")

    import jax

    try:
        devs = jax.devices()
        print(f"jax {jax.__version__}  backend={devs[0].platform}  "
              f"devices={len(devs)}")
    except Exception as e:  # backend init can fail in odd environments
        print(f"jax {jax.__version__}  backend unavailable: {e}")
        devs = []

    from .params import default_params, FilterMode
    from .core.engine_pallas import pallas_pass_supported

    p = default_params(20.0, FilterMode.FLT1)
    for h, w, ch in ((540, 960, 1), (1080, 1920, 1), (1080, 1920, 3)):
        fits = pallas_pass_supported(h, w, ch, p, "filter",
                                     window_dtype="bfloat16")
        eng = "pallas (fused)" if fits else "pallas column strips / v2"
        print(f"  {h}x{w}x{ch}: NL-Kalman engine auto -> {eng}")

    try:
        native = importlib.import_module(".native", __package__)
        ok = getattr(native, "available", lambda: False)()
        print(f"native IO: {'available' if ok else 'not built'} "
              f"(make -C bwd_nlkalman_tpu/native)")
    except Exception:
        print("native IO: not built (make -C bwd_nlkalman_tpu/native)")

    refbin = os.environ.get("BNLK_REFBIN", "/tmp/refbuild/bin")
    have_ref = os.path.isdir(refbin)
    print(f"C reference binaries: {'present at ' + refbin if have_ref else 'absent (golden tests skip; tools/build_reference.sh)'}")

    print("CLI tools: nlkalman-flt, nlkalman-smo, nlkalman-seq, "
          "msnlkalman-seq, msnlkalman-lz3-seq, tvl1flow, bnlk-awgn, "
          "bnlk-psnr, bnlk-decompose, bnlk-recompose, bnlk-iion, "
          "bnlk-plambda  (python -m bwd_nlkalman_tpu.cli.<name> --help)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

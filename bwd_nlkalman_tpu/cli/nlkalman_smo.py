"""nlkalman-smo equivalent: RTS-smooth ONE frame (src/main-smo.c)."""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ._common import (
    add_prms_group, check_size, print_verbose_params, prms_from_args,
    setup_jax,
)
from ..io import read_image, write_image
from ..params import FilterMode, default_params


def main(argv=None):
    ap = argparse.ArgumentParser(prog="nlkalman-smo", description=__doc__)
    io = ap.add_argument_group("Data i/o options")
    io.add_argument("--flt1", required=True, help="input filtered frame t")
    io.add_argument("--smo0", required=True, help="input smoothed frame t+1")
    io.add_argument("-o", "--fflo", default=None, help="input fwd flow path")
    io.add_argument("-k", "--focc", default=None, help="input fwd occlusion mask path")
    io.add_argument("--smo1", required=True, help="output smoothed frame t")
    io.add_argument("-s", "--sigma", type=float, required=True, help="noise standard dev")
    add_prms_group(ap, "s1", "Smoothing options")
    ap.add_argument("-v", "--verbose", type=int, default=0)
    args = ap.parse_args(argv)

    setup_jax()
    import jax.numpy as jnp
    from ..core import nlkalman_smooth_frame
    from ..ops.color import rgb2opp, opp2rgb
    from ..ops.warp import warp_bicubic_nan

    ps = default_params(args.sigma, FilterMode.SMO1, prms_from_args(args, "s1"))
    if args.verbose:
        print_verbose_params(
            {
                "noise": f"{args.sigma:05.2f}",
                "filtered t": args.flt1,
                "smoothed t+1": args.smo0,
                "fwd flows": args.fflo,
                "fwd occlus.": args.focc,
            },
            {"smoothed t": args.smo1},
            {"smoothing parameters": ps},
        )
    flt1_np = read_image(args.flt1)
    smo0_np = read_image(args.smo0)
    check_size("smoothed frame t+1", smo0_np, flt1_np, "filtered frame")
    flt1 = rgb2opp(jnp.asarray(flt1_np))
    smo0 = rgb2opp(jnp.asarray(smo0_np))
    if args.fflo:
        fflo_np = read_image(args.fflo)
        check_size("flow", fflo_np, flt1_np, "filtered frame", channels=2)
        fflo = jnp.asarray(fflo_np)
        if args.focc:
            focc_np = read_image(args.focc)
            check_size("occlusion mask", focc_np, flt1_np, "filtered frame",
                       channels="any")
            focc = jnp.asarray(focc_np[..., 0] if focc_np.ndim == 3 else focc_np)
        else:
            focc = None
        smo0, valid = warp_bicubic_nan(smo0, fflo, focc)
    else:
        valid = None
    smo1 = nlkalman_smooth_frame(flt1, smo0, valid, args.sigma, ps)
    write_image(args.smo1, np.asarray(opp2rgb(smo1)))
    return 0


if __name__ == "__main__":
    sys.exit(main())

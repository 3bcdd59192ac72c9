"""nlkalman-flt equivalent: filter ONE frame (two cascaded passes).

Flags mirror src/main-flt.c:71-117; a -1 value means "auto" (resolved
from sigma like nlkalman_default_params).
"""

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
    ap = argparse.ArgumentParser(prog="nlkalman-flt", description=__doc__)
    io = ap.add_argument_group("Data i/o options")
    io.add_argument("-i", "--nisy", required=True, help="input noisy frame path")
    io.add_argument("-o", "--bflo", default=None, help="input bwd flow path")
    io.add_argument("-k", "--bocc", default=None, help="input bwd occlusion mask path")
    io.add_argument("--flt10", default=None, help="input previous first filtering path")
    io.add_argument("--flt20", default=None, help="input previous second filtering path")
    io.add_argument("--flt11", default=None, help="input/output first filtering path")
    io.add_argument("--flt21", default=None, help="output second filtering path")
    io.add_argument("-s", "--sigma", type=float, required=True, help="noise standard dev")
    add_prms_group(ap, "f1", "First filtering options")
    add_prms_group(ap, "f2", "Second filtering options")
    ap.add_argument("-v", "--verbose", type=int, default=0)
    args = ap.parse_args(argv)

    setup_jax()
    import jax.numpy as jnp
    from ..core import nlkalman_filter_frame
    from ..ops.color import rgb2opp, opp2rgb
    from ..ops.warp import warp_bicubic_nan

    apply_f1 = args.f1_p != 0
    apply_f2 = args.f2_p != 0
    p1 = default_params(args.sigma, FilterMode.FLT1, prms_from_args(args, "f1"))
    p2 = default_params(args.sigma, FilterMode.FLT2, prms_from_args(args, "f2"))

    if args.verbose:
        io_in = {
            "noise": f"{args.sigma:05.2f}",
            "noisy frames": args.nisy,
            "bwd flows": args.bflo,
            "bwd occlus.": args.bocc,
            "prev filt 1": args.flt10,
            "prev filt 2": args.flt20,
        }
        if not apply_f1:
            io_in["filtering 1"] = args.flt11
        io_out = {}
        if apply_f1:
            io_out["filtering 1"] = args.flt11
        io_out["filtering 2"] = args.flt21
        groups = {}
        if apply_f1:
            groups["first filtering parameters"] = p1
        if apply_f2:
            groups["second filtering parameters"] = p2
        print_verbose_params(io_in, io_out, groups)

    nisy_np = read_image(args.nisy)
    nisy = jnp.asarray(nisy_np)
    bflo = None
    if args.bflo:
        bflo_np = read_image(args.bflo)
        check_size("flow", bflo_np, nisy_np, "noisy frame", channels=2)
        bflo = jnp.asarray(bflo_np)
    bocc = None
    if args.bocc:
        bocc_np = read_image(args.bocc)
        check_size("occlusion mask", bocc_np, nisy_np, "noisy frame",
                   channels="any")
        bocc = jnp.asarray(bocc_np[..., 0] if bocc_np.ndim == 3 else bocc_np)
    n_opp = rgb2opp(nisy)

    def load_warp(path):
        if path is None or bflo is None:
            return None, None
        img_np = read_image(path)
        check_size(path, img_np, nisy_np, "noisy frame")
        img = rgb2opp(jnp.asarray(img_np))
        return warp_bicubic_nan(img, bflo, bocc)

    flt11 = None
    if apply_f1:
        w0, v0 = load_warp(args.flt10)
        flt11 = nlkalman_filter_frame(n_opp, w0, v0, None, args.sigma, p1)
    elif args.flt11:
        flt11 = rgb2opp(jnp.asarray(read_image(args.flt11)))

    flt21 = None
    if apply_f2:
        w0, v0 = load_warp(args.flt20)
        flt21 = nlkalman_filter_frame(n_opp, w0, v0, flt11, args.sigma, p2)
        if args.flt21:
            write_image(args.flt21, np.asarray(opp2rgb(flt21)))

    if apply_f1 and args.flt11:
        write_image(args.flt11, np.asarray(opp2rgb(flt11)))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""recompose equivalent (lib/multiscale/recompose.cpp):
usage: recompose prefix levels suffix output [-c factor]"""

from __future__ import annotations

import sys

import numpy as np

from ._common import setup_jax
from ..io import read_image, write_image


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    factor = 0.8
    if "-c" in argv:
        i = argv.index("-c")
        factor = float(argv[i + 1])
        del argv[i : i + 2]
    if len(argv) != 4:
        print("Usage: recompose prefix levels suffix output [-c factor]", file=sys.stderr)
        return 1
    prefix, levels, suffix, outp = argv[0], int(argv[1]), argv[2], argv[3]
    setup_jax()
    import jax.numpy as jnp
    from ..ops.pyramid import dct_recompose

    lvls = [jnp.asarray(read_image(f"{prefix}{i}{suffix}")) for i in range(levels)]
    write_image(outp, np.asarray(dct_recompose(lvls, factor)))
    return 0


if __name__ == "__main__":
    sys.exit(main())

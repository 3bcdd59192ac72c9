"""decompose equivalent (lib/multiscale/decompose.cpp):
usage: decompose input prefix levels suffix [-r ratio]"""

from __future__ import annotations

import sys

import numpy as np

from ._common import setup_jax
from ..io import read_image, write_image


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    ratio = 2.0
    if "-r" in argv:
        i = argv.index("-r")
        ratio = float(argv[i + 1])
        del argv[i : i + 2]
    if len(argv) != 4:
        print("Usage: decompose input prefix levels suffix [-r ratio]", file=sys.stderr)
        return 1
    inp, prefix, levels, suffix = argv[0], argv[1], int(argv[2]), argv[3]
    setup_jax()
    import jax.numpy as jnp
    from ..ops.pyramid import dct_decompose

    img = jnp.asarray(read_image(inp))
    for i, lv in enumerate(dct_decompose(img, levels, ratio)):
        write_image(f"{prefix}{i}{suffix}", np.asarray(lv))
    return 0


if __name__ == "__main__":
    sys.exit(main())

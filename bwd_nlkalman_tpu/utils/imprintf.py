"""printf-style image statistics — the imprintf equivalent.

Covers the directives the pipeline uses (lib/imscript-lite/src/imprintf.c):
%v average, %N number of samples, %i minimum, %a maximum, %m median,
%d standard deviation, %e average absolute value, plus %% and \\n escapes.
"""

from __future__ import annotations

import re

import numpy as np

_DIRECTIVE = re.compile(r"%([vNiamde])")


def imprintf(fmt: str, img) -> str:
    x = np.asarray(img, np.float64).ravel()

    def sub(m):
        d = m.group(1)
        if d == "v":
            return f"{x.mean():g}"
        if d == "N":
            return f"{x.size}"
        if d == "i":
            return f"{x.min():g}"
        if d == "a":
            return f"{x.max():g}"
        if d == "m":
            return f"{np.median(x):g}"
        if d == "d":
            return f"{x.std():g}"
        if d == "e":
            return f"{np.abs(x).mean():g}"
        raise ValueError(d)

    out = _DIRECTIVE.sub(sub, fmt)
    return out.replace("\\n", "\n").replace("%%", "%")

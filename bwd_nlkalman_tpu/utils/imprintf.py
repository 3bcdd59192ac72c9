"""printf-style image statistics — the imprintf equivalent.

Directives from lib/imscript-lite/src/imprintf.c (sample-level set):
%v average, %N number of samples, %i minimum, %a maximum, %m median,
%d standard deviation, %e average absolute value, %r root mean square,
%s sum, %k number of distinct samples, %y #infinite, %Y #NaN,
%q[n] nth sample percentile (imprintf.c:496-507: index
(count-1)*n/100 into the sorted finite samples), %w %h %c geometry,
plus %% and \\n escapes.
"""

from __future__ import annotations

import re

import numpy as np

_DIRECTIVE = re.compile(r"%(q\[(\d+)\]|[vNiamderskyYwhc])")


def imprintf(fmt: str, img) -> str:
    arr = np.asarray(img, np.float64)
    x = arr.ravel()
    finite = x[np.isfinite(x)]

    def sub(m):
        d = m.group(1)
        if d.startswith("q"):
            q = int(m.group(2)) % 101
            if finite.size == 0:
                return "nan"
            srt = np.sort(finite)
            pq = ((finite.size - 1) * q) // 100
            return f"{srt[pq]:g}"
        if d == "v":
            return f"{x.mean():g}"
        if d == "N":
            return f"{x.size}"
        if d == "i":
            return f"{finite.min():g}" if finite.size else "nan"
        if d == "a":
            return f"{finite.max():g}" if finite.size else "nan"
        if d == "m":
            return f"{np.median(finite):g}" if finite.size else "nan"
        if d == "d":
            return f"{x.std():g}"
        if d == "e":
            return f"{np.abs(x).mean():g}"
        if d == "r":
            return f"{np.sqrt(np.mean(x * x)):g}"
        if d == "s":
            return f"{x.sum():g}"
        if d == "k":
            return f"{np.unique(x).size}"
        if d == "y":
            return f"{int(np.isinf(x).sum())}"
        if d == "Y":
            return f"{int(np.isnan(x).sum())}"
        if d == "w":
            return f"{arr.shape[1] if arr.ndim >= 2 else arr.shape[0]}"
        if d == "h":
            return f"{arr.shape[0]}"
        if d == "c":
            return f"{arr.shape[2] if arr.ndim == 3 else 1}"
        raise ValueError(d)

    out = _DIRECTIVE.sub(sub, fmt)
    return out.replace("\\n", "\n").replace("%%", "%")

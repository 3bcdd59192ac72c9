"""RPN per-pixel expression evaluator — the plambda workhorse.

A vectorized numpy re-design of the reference's plambda
(lib/imscript-lite/src/plambda.c), covering the language subset the
pipeline and eval scripts actually use:

- stack arithmetic: + - * / ^ , unary fabs sqrt exp log sin cos round,
  comparisons < > = , logic not and or, min max, constants (pi, e, nan)
- image access: x, y, z ... (first, second, third input); x[c] component
  access; x(dx,dy) neighbor access with edge clamping; x(dx,dy)[c]
- image statistics suffixes: x%v (mean), x%a (max abs? -> avg per
  plambda semantics: %v average), x%i (min), x%x (max), x%m (median)

Examples (from the pipeline):
    plambda("x(0,0)[0] x(-1,0)[0] - x(0,0)[1] x(0,-1)[1] - + fabs 0.75 > 255 *", flow)
    plambda("x y - 2 ^", a, b)   # squared error (scripts/psnr.sh:9)
"""

from __future__ import annotations

import math
import re

import numpy as np

_VAR_RE = re.compile(
    r"^([xyzuvwabc])"            # image name
    r"(?:\((-?\d+),(-?\d+)\))?"   # optional neighbor offset
    r"(?:\[(\d+)\])?"             # optional component
    r"(?:%([a-zA-Z])(\d+)?)?$"    # optional statistic (+percentile rank)
)

_BINOPS = {
    "+": np.add,
    "-": np.subtract,
    "*": np.multiply,
    "/": np.divide,
    "^": np.power,
    "<": lambda a, b: (a < b).astype(np.float32),
    ">": lambda a, b: (a > b).astype(np.float32),
    "=": lambda a, b: (a == b).astype(np.float32),
    "min": np.minimum,
    "max": np.maximum,
    "and": lambda a, b: ((a != 0) & (b != 0)).astype(np.float32),
    "or": lambda a, b: ((a != 0) | (b != 0)).astype(np.float32),
}

_UNOPS = {
    "fabs": np.abs,
    "abs": np.abs,
    "sqrt": np.sqrt,
    "exp": np.exp,
    "log": np.log,
    "sin": np.sin,
    "cos": np.cos,
    "tan": np.tan,
    "round": np.rint,
    "floor": np.floor,
    "ceil": np.ceil,
    "not": lambda a: (a == 0).astype(np.float32),
    "neg": np.negative,
    "log10": np.log10,
    "log2": np.log2,
    "atan": np.arctan,
    "asin": np.arcsin,
    "acos": np.arccos,
}

_CONSTS = {"pi": math.pi, "e": math.e, "nan": math.nan, "inf": math.inf}

_NAMES = "xyzuvwabc"


def _shift(img: np.ndarray, dx: int, dy: int) -> np.ndarray:
    """Neighbor access with edge clamping: value at (col+dx, row+dy)."""
    h, w = img.shape[:2]
    rows = np.clip(np.arange(h) + dy, 0, h - 1)
    cols = np.clip(np.arange(w) + dx, 0, w - 1)
    return img[rows][:, cols]


def plambda_calc(expr: str) -> float:
    """The -c calculator mode (plambda.c main_calc): evaluate an RPN
    expression with NO images and return the scalar result — the form
    the eval scripts use for PSNR arithmetic, e.g.
    plambda -c "255 $RMSE / log10 20 *" (scripts/psnr.sh,
    nlkalman-train.sh:36-52)."""
    out = plambda(expr, np.zeros((1, 1, 1), np.float32))
    return float(np.asarray(out).ravel()[0])


def plambda(expr: str, *images) -> np.ndarray:
    """Evaluate an RPN expression over input images ((H, W, C) float)."""
    imgs = [np.atleast_3d(np.asarray(im, np.float32)) for im in images]
    stack: list = []
    for tok in expr.split():
        if tok in _BINOPS:
            b = stack.pop()
            a = stack.pop()
            stack.append(_BINOPS[tok](a, b))
            continue
        if tok in _UNOPS:
            stack.append(_UNOPS[tok](stack.pop()))
            continue
        if tok in _CONSTS:
            stack.append(np.float32(_CONSTS[tok]))
            continue
        m = _VAR_RE.match(tok)
        if m and m.group(1) in _NAMES[: len(imgs)]:
            img = imgs[_NAMES.index(m.group(1))]
            if m.group(2) is not None:
                img = _shift(img, int(m.group(2)), int(m.group(3)))
            if m.group(4) is not None:
                img = img[..., int(m.group(4)) : int(m.group(4)) + 1]
            if m.group(5) is not None:
                # magic statistics (plambda.c eval_magicvar:1276-1330):
                # i min, a max, v avg, s sum, r std, m median,
                # q<nn> percentile (qpos = round(qq*N/100), clamped)
                st = m.group(5)
                if st == "v":
                    img = np.float32(img.mean())
                elif st == "i":
                    img = np.float32(img.min())
                elif st in ("a", "x"):   # 'x' kept as a max alias
                    img = np.float32(img.max())
                elif st == "s":
                    img = np.float32(img.sum())
                elif st == "r":
                    img = np.float32(img.std())
                elif st == "m":
                    img = np.float32(np.median(img))
                elif st == "q":
                    qq = int(m.group(6) or 50)
                    flat = np.sort(img.ravel())
                    qpos = int(np.clip(round(qq * flat.size / 100.0),
                                       0, flat.size - 1))
                    img = np.float32(flat[qpos])
                else:
                    raise ValueError(f"unsupported statistic %{st}")
            stack.append(img)
            continue
        try:
            stack.append(np.float32(float(tok)))
        except ValueError:
            raise ValueError(f"plambda: unknown token {tok!r}") from None
    if len(stack) != 1:
        raise ValueError(f"plambda: {len(stack)} values left on stack")
    out = stack[0]
    if np.isscalar(out) or out.ndim == 0:
        out = np.broadcast_to(out, imgs[0].shape).astype(np.float32)
    return np.asarray(out, np.float32)

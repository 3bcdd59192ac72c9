"""Phase attribution of the fused NL-Kalman kernel (BNLK_KERNEL_SKIP).

The whole pass is ONE Pallas kernel, so the profiler cannot split it.
This peels phases cumulatively from the back (E=aggregation,
C=statistics, B=selection, A=distances, G=IDCT/fold, F=band fill) and
reports the timing deltas; each setting runs in a fresh subprocess
(the skip set is baked in at trace time).

Usage: python tools/profile_pass_phases.py [H W] [filter|smooth]
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(root)r)
os.environ.setdefault("BNLK_WINDOW_DTYPE", "bfloat16")
os.environ["BNLK_ENGINE"] = "pallas"
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/bnlk_jax_cache")
import jax.numpy as jnp
from bwd_nlkalman_tpu.params import default_params, FilterMode
from bwd_nlkalman_tpu.core import nlkalman_filter_frame, nlkalman_smooth_frame

h, w, mode, sigma = %(h)d, %(w)d, %(mode)r, 20.0
rng = np.random.default_rng(0)
base = rng.uniform(40, 215, (h + 8, w + 8)).astype(np.float32)
nz = lambda s: s + sigma * rng.standard_normal(s.shape).astype(np.float32)
cur = jnp.asarray(nz(base[:h, :w]))[..., None]
prev = jnp.asarray(nz(base[1:1+h, 1:1+w]))[..., None]
vr = np.ones((h, w), bool); vr[:2] = vr[-2:] = 0; vr[:, :2] = vr[:, -2:] = 0
valid = jnp.asarray(vr)
if mode == "filter":
    p = default_params(sigma, FilterMode.FLT1)
    f = jax.jit(lambda n, d, v: nlkalman_filter_frame(n, d, v, None, sigma, p))
else:
    p = default_params(sigma, FilterMode.SMO1)
    f = jax.jit(lambda n, d, v: nlkalman_smooth_frame(n, d, v, sigma, p))
def sync(o):
    return np.asarray(jax.device_get(o.ravel()[:1]))
sync(f(cur, prev, valid))
reps = 10
t0 = time.perf_counter()
for _ in range(reps):
    o = f(cur, prev, valid)
sync(o)
print((time.perf_counter() - t0) / reps * 1000.0)
"""


def run(skip: str, h: int, w: int, mode: str) -> float:
    env = dict(os.environ, BNLK_KERNEL_SKIP=skip)
    out = subprocess.run(
        [sys.executable, "-c",
         CHILD % dict(root=os.path.dirname(HERE), h=h, w=w, mode=mode)],
        env=env, capture_output=True, text=True, timeout=1500,
    )
    if out.returncode != 0:
        print(out.stdout, out.stderr, file=sys.stderr)
        raise SystemExit(f"skip={skip!r} failed")
    return float(out.stdout.strip().splitlines()[-1])


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    mode = sys.argv[3] if len(sys.argv) > 3 else "filter"
    # cumulative peeling from the back; each step removes one phase
    settings = ["", "E", "C,E", "B,C,E", "A,B,C,E", "A,B,C,E,G",
                "A,B,C,E,F,G"]
    names = ["full", "-E agg", "-C stats", "-B select", "-A dist",
             "-G idct/fold", "-F fill"]
    prev = None
    for name, s in zip(names, settings):
        ms = run(s, h, w, mode)
        delta = "" if prev is None else f"  (phase cost {prev - ms:+.2f} ms)"
        print(f"{name:>12}: {ms:7.2f} ms{delta}", flush=True)
        prev = ms


if __name__ == "__main__":
    main()

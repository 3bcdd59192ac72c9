"""Isolate the spatial-fallback (outer-offset) remnant cost of the NLK
filter pass by varying only the validity DATA on one compiled kernel:

- allvalid : no site lacks a temporal patch -> outer groups never fire
- realistic: 2px frame border + one occlusion blob invalid
- allinvalid: every site spatial -> outer groups fire on every block

Usage: python tools/bench_pass_outer.py [H W]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("BNLK_WINDOW_DTYPE", "bfloat16")
os.environ["BNLK_ENGINE"] = "pallas"

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/bnlk_jax_cache")

import jax.numpy as jnp


def sync(o):
    return np.asarray(jax.device_get(o.ravel()[:1]))


def main():
    from bwd_nlkalman_tpu.params import default_params, FilterMode
    from bwd_nlkalman_tpu.core import nlkalman_filter_frame

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    sigma = 20.0
    rng = np.random.default_rng(0)
    base = rng.uniform(40, 215, (h + 8, w + 8)).astype(np.float32)
    nz = lambda s: s + sigma * rng.standard_normal(s.shape).astype(np.float32)
    noisy = jnp.asarray(nz(base[:h, :w]))[..., None]
    prev = jnp.asarray(nz(base[1:1 + h, 1:1 + w]))[..., None]
    p1 = default_params(sigma, FilterMode.FLT1)

    vr = np.ones((h, w), bool)
    vr[:2] = vr[-2:] = False
    vr[:, :2] = vr[:, -2:] = False
    vr[500:540, 900:960] = False
    masks = {
        "allvalid": np.ones((h, w), bool),
        "realistic": vr,
        "allinvalid": np.zeros((h, w), bool),
    }

    f = jax.jit(lambda n, p, v: nlkalman_filter_frame(n, p, v, None, sigma, p1))
    sync(f(noisy, prev, jnp.asarray(vr)))
    for name, m in masks.items():
        v = jnp.asarray(m)
        sync(f(noisy, prev, v))
        t0 = time.perf_counter()
        for _ in range(5):
            o = f(noisy, prev, v)
        sync(o)
        print(f"{name:10s}: {(time.perf_counter() - t0) / 5 * 1000:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()

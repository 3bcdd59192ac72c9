"""Training-fixture economy demo (VERDICT round-2 item 6).

Times repeated trials on the chip with precomputed flow/occlusion
fixtures (the reference's training protocol, nlkalman-train.sh:17-28)
vs recomputing TV-L1 inside every trial.  The same parameter set is
evaluated in both arms so the measured gap is exactly the flow reuse
(group-size/beta variation across trials is free in both arms via the
dynamic-scalar path — see train.search._dyn_split).

Usage: python tools/bench_fixtures.py [n_trials] (default 5)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/bnlk_jax_cache")


def main():
    from bwd_nlkalman_tpu.params import FilterMode, default_params
    from bwd_nlkalman_tpu.train import evaluate, make_fixtures

    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rng = np.random.default_rng(0)
    t, h, w = 12, 192, 192
    base = np.cumsum(rng.normal(size=(h + 2 * t, w + 2 * t)), 1)
    base = ((base - base.min()) / (base.max() - base.min()) * 200 + 20)
    clean = np.stack(
        [base[2 * i : 2 * i + h, i : i + w] for i in range(t)]
    )[..., None].astype(np.float32)

    p1 = default_params(20.0, FilterMode.FLT1)
    p2 = default_params(20.0, FilterMode.FLT2)
    ps = default_params(20.0, FilterMode.SMO1)

    t0 = time.perf_counter()
    fx = make_fixtures(clean, 20.0, list(range(t)))
    fix_s = time.perf_counter() - t0
    print(f"fixture precompute: {fix_s:.1f}s (once per (sequence, sigma))",
          flush=True)

    def run(n, fixtures):
        r = None
        for _ in range(n):
            r = evaluate([clean], 20.0, p1, p2, ps, first_frame=4,
                         fixtures=fixtures, dynamic=fixtures is not None)
        return r

    run(1, [fx])                       # compile
    t0 = time.perf_counter()
    r_fx = run(n_trials, [fx])
    with_fx = time.perf_counter() - t0
    print(f"{n_trials} trials WITH fixtures:    {with_fx:.1f}s "
          f"(flt2 mse {r_fx.mse['flt2']:.2f})", flush=True)

    run(1, None)                       # compile
    t0 = time.perf_counter()
    r_no = run(n_trials, None)
    without = time.perf_counter() - t0
    print(f"{n_trials} trials WITHOUT fixtures: {without:.1f}s "
          f"(flt2 mse {r_no.mse['flt2']:.2f})", flush=True)
    print(f"speedup: {without / with_fx:.1f}x", flush=True)


if __name__ == "__main__":
    main()

"""Per-stage performance regression gate (run on the real chip).

Asserts the per-stage budgets that back the bench figure, so kernel work
can't silently regress them.  Budgets are generous vs the measured round-3
numbers (see ROUND_NOTES.md) but far below the round-2 floor.

Usage: python tools/perf_gate.py [--update]
  --update rewrites tools/perf_budgets.json with current * 1.3 margins.
Exit code 1 on any budget violation.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/bnlk_jax_cache")

import jax.numpy as jnp

BUDGET_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "perf_budgets.json")


def sync(o):
    if isinstance(o, (tuple, list)):
        o = o[0]
    return np.asarray(jax.device_get(o.ravel()[:1]))


def timeit(fn, reps=3):
    sync(fn())                     # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn()
    sync(o)
    return (time.perf_counter() - t0) / reps * 1000


def measure():
    from bwd_nlkalman_tpu.flow import tvl1_flow
    from bwd_nlkalman_tpu.core.engine_pallas import dense_pass_pallas
    from bwd_nlkalman_tpu.params import default_params, FilterMode

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    i0 = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    i1 = jnp.asarray(np.roll(np.asarray(i0), (2, -3), (0, 1)))
    cur = jnp.asarray(rng.uniform(0, 255, (h, w, 1)).astype(np.float32))
    prev = jnp.asarray(
        np.asarray(cur) + 3 * rng.standard_normal((h, w, 1)).astype(np.float32)
    )
    valid = jnp.ones((h, w), bool)
    p1 = default_params(20.0, FilterMode.FLT1)
    ps = default_params(20.0, FilterMode.SMO1)

    out = {}
    flow_fn = jax.jit(lambda a, b: tvl1_flow(a, b, fscale=1))
    out["flow_1080p_fscale1_ms"] = timeit(lambda: flow_fn(i0, i1))
    # the PRODUCTION per-frame flow cost: the scan drivers carry the
    # level-fscale flow between frames and re-solve only that level at
    # reduced effort (bench default warm_nwarps=3, PSNR-gated by
    # tests/test_warm_effort_gate.py); the cold pyramid above is paid
    # only at scene cuts
    from bwd_nlkalman_tpu.flow.tvl1 import tvl1_flow_warm

    _, carry = tvl1_flow(i0, i1, fscale=1, return_carry=True)
    warm_fn = jax.jit(lambda a, b, u: tvl1_flow_warm(
        a, b, u, fscale=1, warm_nwarps=3)[0])
    out["flow_warm_1080p_ms"] = timeit(lambda: warm_fn(i0, i1, carry))
    out["nlk_filter_1080p_ms"] = timeit(lambda: dense_pass_pallas(
        cur, prev, valid, cur, 20.0, p1, "filter", True, False,
        window_dtype="bfloat16"))
    out["nlk_smooth_1080p_ms"] = timeit(lambda: dense_pass_pallas(
        cur, prev, valid, cur, 20.0, ps, "smooth", True, False,
        window_dtype="bfloat16"))
    return out


def main():
    res = measure()
    for k, v in res.items():
        print(f"{k:28s}: {v:8.1f} ms", flush=True)
    if "--update" in sys.argv:
        budgets = {k: round(v * 1.3, 1) for k, v in res.items()}
        with open(BUDGET_PATH, "w") as fh:
            json.dump(budgets, fh, indent=1)
        print(f"budgets written to {BUDGET_PATH}: {budgets}")
        return 0
    if not os.path.exists(BUDGET_PATH):
        print("no budget file; run with --update first", file=sys.stderr)
        return 1
    budgets = json.load(open(BUDGET_PATH))
    bad = [
        f"{k}: {res[k]:.1f} ms > budget {b:.1f} ms"
        for k, b in budgets.items() if k in res and res[k] > b
    ]
    for line in bad:
        print("REGRESSION " + line, file=sys.stderr)
    print("PASS" if not bad else "FAIL")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

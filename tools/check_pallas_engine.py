"""Dev check: fused Pallas NL-Kalman kernel vs the v2 XLA engine.

CPU interpret mode by default (BNLK_CHECK_TPU=1 runs compiled on the real
chip).  Compares all mode/prev/basic combinations on a small frame.
"""

import os
import sys

if os.environ.get("BNLK_CHECK_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax

if os.environ.get("BNLK_CHECK_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/bnlk_jax_cache")

import jax.numpy as jnp
from bwd_nlkalman_tpu.core.engine import dense_pass_v2
from bwd_nlkalman_tpu.core.engine_pallas import dense_pass_pallas
from bwd_nlkalman_tpu.params import NLKParams

INTERP = os.environ.get("BNLK_CHECK_TPU", "0") != "1"


def mk(rng, h, w, ch):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    clean = (100 + 60 * np.sin(0.1 * xx) + 50 * np.cos(0.13 * yy))[..., None]
    clean = np.repeat(clean, ch, -1).astype(np.float32)
    return clean


def run_case(name, mode, has_prev, has_basic, prms, h=32, w=40, ch=1,
             sigma=20.0):
    rng = np.random.default_rng(0)
    clean = mk(rng, h, w, ch)
    cur = clean + sigma * rng.standard_normal(clean.shape).astype(np.float32)
    prev = clean + 2 * rng.standard_normal(clean.shape).astype(np.float32)
    valid = np.ones((h, w), bool)
    valid[10:14, 20:26] = False
    basic = clean + 4 * rng.standard_normal(clean.shape).astype(np.float32)

    cur_j = jnp.asarray(cur)
    prev_j = jnp.asarray(np.where(valid[..., None], prev, 0.0))
    valid_j = jnp.asarray(valid if has_prev else np.zeros((h, w), bool))
    basic_j = jnp.asarray(basic) if has_basic else cur_j
    if not has_prev:
        prev_j = jnp.zeros_like(cur_j)

    want = np.asarray(dense_pass_v2(
        cur_j, prev_j, valid_j, basic_j, sigma, prms, mode,
        has_prev, has_basic,
    ))
    got = np.asarray(dense_pass_pallas(
        cur_j, prev_j, valid_j, basic_j, sigma, prms, mode,
        has_prev, has_basic, interpret=INTERP,
    ))
    err = np.max(np.abs(got - want))
    rel = err / (np.max(np.abs(want)) + 1e-9)
    status = "OK " if err < 5e-2 else "FAIL"
    print(f"{status} {name}: max abs err {err:.3e} (rel {rel:.2e})", flush=True)
    return err < 5e-2


def main():
    prms = NLKParams(
        patch_sz=8, search_sz_x=6, search_sz_t=3,
        npatches_x=12, npatches_t=8, npatches_tagg=4,
        dista_lambda=1.0, beta_x=3.0, beta_t=2.0,
    )
    sprms = NLKParams(
        patch_sz=8, search_sz_x=6, search_sz_t=3,
        npatches_x=0, npatches_t=8, npatches_tagg=8,
        dista_lambda=1.0, beta_x=0.0, beta_t=4.0,
    )
    ok = True
    ok &= run_case("filter spatial      ", "filter", False, False, prms)
    ok &= run_case("filter temporal     ", "filter", True, False, prms)
    ok &= run_case("filter basic+prev   ", "filter", True, True, prms)
    ok &= run_case("filter basic only   ", "filter", False, True, prms)
    ok &= run_case("smooth temporal     ", "smooth", True, False, sprms)
    ok &= run_case("smooth passthrough  ", "smooth", False, False, sprms)
    ok &= run_case("filter temporal rgb ", "filter", True, False, prms, ch=3)
    print("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

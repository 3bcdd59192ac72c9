"""PSNR gate for warm-started streaming TV-L1 (FlowConfig.warm_start).

The warm path replaces the coarse-to-fine initialization of every
in-scan flow solve with the previous scan step's level-fscale solution
(flow/tvl1.py:tvl1_flow_warm); solver, stopping rule and parameters are
the reference's own.  This runs the parity-scale scene through the full
pipeline cold vs warm and prints PSNR + wall time; a scene-CUT variant
(the adversarial case for a stale carry: the motion field flips sign
mid-clip) checks the warp stages re-converge from a wrong init.

Usage: python tools/flow_warm_gate.py [config ...] [--warm-nwarps N]
                                        [--warm-maxit N]
  default: 540g 1080g.  --warm-nwarps/--warm-maxit set the REDUCED warm
  effort (FlowConfig.warm_nwarps/warm_max_iters) to gate.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import numpy as np

CONFIGS = {
    "540g": dict(h=540, w=960, c=1, sigma=20.0, t=6),
    "540g40": dict(h=540, w=960, c=1, sigma=40.0, t=6),
    "540rgb": dict(h=540, w=960, c=3, sigma=20.0, t=6),
    "1080g": dict(h=1080, w=1920, c=1, sigma=20.0, t=4),
    "1080g40": dict(h=1080, w=1920, c=1, sigma=40.0, t=4),
}


WARM_KW = {}


def run(clean, noisy, sigma, warm):
    from bwd_nlkalman_tpu.pipeline import denoise_sequence, sequence_psnr
    from bwd_nlkalman_tpu.pipeline.sequence import FlowConfig

    cfg = FlowConfig(warm_start=warm, **(WARM_KW if warm else {}))
    t0 = time.perf_counter()
    _, flt2, smo = denoise_sequence(noisy, sigma, flow_cfg=cfg)
    flt2 = np.asarray(flt2)
    smo = np.asarray(smo)
    dt = time.perf_counter() - t0
    p2 = sequence_psnr(clean, flt2, first_frame=1)["psnr"]
    ps = sequence_psnr(clean[:-1], smo[:-1])["psnr"]
    return p2, ps, dt


def main():
    args = sys.argv[1:]
    if "--warm-nwarps" in args:
        i = args.index("--warm-nwarps")
        WARM_KW["warm_nwarps"] = int(args[i + 1]); del args[i:i + 2]
    if "--warm-maxit" in args:
        i = args.index("--warm-maxit")
        WARM_KW["warm_max_iters"] = int(args[i + 1]); del args[i:i + 2]
    names = args or ["540g", "1080g"]
    if WARM_KW:
        print(f"warm effort: {WARM_KW}", flush=True)

    import jax
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:  # the axon plugin ignores the env var alone
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/tmp/bnlk_jax_cache")
    from bwd_nlkalman_tpu.pipeline import add_noise_sequence
    from test_pipeline import make_sequence

    for name in names:
        cfg = CONFIGS[name]
        h, w, c, sigma, t = cfg["h"], cfg["w"], cfg["c"], cfg["sigma"], cfg["t"]
        rng = np.random.default_rng(77)
        clean = make_sequence(rng, t=t, h=h, w=w, c=c)
        noisy = np.asarray(
            add_noise_sequence(clean, sigma, seeds=[700 + i for i in range(t)])
        )

        # scene cut: second half plays the motion BACKWARD (carry is the
        # negation of the true flow at the cut frame)
        cut = np.concatenate([clean[: t // 2], clean[t // 2 :][::-1]], axis=0)
        cut_noisy = np.asarray(
            add_noise_sequence(cut, sigma, seeds=[900 + i for i in range(t)])
        )

        for label, cl, nz in (("scene", clean, noisy), ("cut", cut, cut_noisy)):
            for warm in (False, True):
                p2, ps, dt = run(cl, nz, sigma, warm)
                print(
                    f"{name:8s} {label:6s} {'warm' if warm else 'cold'}: "
                    f"flt2 {p2:.3f} dB  smo1 {ps:.3f} dB  "
                    f"(wall {dt:.0f}s incl compile)",
                    flush=True,
                )
            print(f"{name:8s} {label:6s} gate: "
                  + gate_take_rate(nz, sigma), flush=True)


def gate_take_rate(noisy, sigma):
    """How often the residual gate actually takes the warm branch on this
    content: replays the filter scan's flow chain frame by frame and
    evaluates warm_gate_ok on each carry (ADVICE r3: record the rate)."""
    import jax.numpy as jnp
    from bwd_nlkalman_tpu.flow.tvl1 import (
        tvl1_flow, tvl1_flow_warm, warm_gate_ok, _prep_pair, num_scales,
    )
    from bwd_nlkalman_tpu.pipeline.sequence import (
        filter_sequence, FlowConfig)
    from bwd_nlkalman_tpu.flow.tvl1 import luma
    from bwd_nlkalman_tpu.ops.zoom import zoom_out

    cfg = FlowConfig(warm_start=True)
    flt1, flt2 = filter_sequence(jnp.asarray(noisy), sigma, flow_cfg=cfg)
    kw = dict(fscale=cfg.fscale, lambda_=cfg.lambda_, nwarps=cfg.nwarps)
    takes = []
    _, u_c = tvl1_flow(luma(jnp.asarray(noisy[1])), luma(flt2[0]),
                       return_carry=True, **kw)
    for t in range(2, noisy.shape[0]):
        i0, i1 = luma(jnp.asarray(noisy[t])), luma(flt2[t - 1])
        a, b = _prep_pair(i0, i1)
        for _ in range(cfg.fscale):
            a, b = zoom_out(a, cfg.zfactor), zoom_out(b, cfg.zfactor)
        ok, rw, rz = warm_gate_ok(a, b, u_c)
        takes.append(bool(ok))
        _, u_c = tvl1_flow_warm(i0, i1, u_c, **kw)
    if not takes:
        return "n/a (T<3)"
    return (f"warm branch taken {sum(takes)}/{len(takes)} steps "
            f"({100.0 * sum(takes) / len(takes):.0f}%)")


if __name__ == "__main__":
    main()

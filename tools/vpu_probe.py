"""Measure the ACTUAL VPU vector-op issue ceiling of this chip.

tools/mfu.py's v5e VPU peak (3.95 TFLOP/s = 8x128 lanes x 4 ALUs x
0.94 GHz, all-FMA) sets the roofline the VERDICT's "6% utilization /
10x headroom" claim rests on.  The NL-Kalman phase attribution
(tools/profile_pass_phases.py) and a hand op-count of phases C/E both
land at ~1 vector-register op per cycle — if that is the machine's real
issue rate for mixed elementwise chains, the kernels are near
speed-of-light and the model peak is miscalibrated, not the kernels.

This probe times pure in-VMEM elementwise chains inside one Pallas
kernel (no HBM traffic in the timed loop) across the axes that matter:

  fma8    8 independent FMA accumulator chains (max ILP)
  fma1    1 serial FMA chain (latency bound)
  mul8    8 independent multiply chains (non-FMA issue rate)
  fmabf8  8 independent bf16 FMA chains (packed-math rate?)

Prints vreg-ops/cycle for each (vreg = 8x128 lanes; FMA counted as ONE
op) so the result is directly comparable to kernel op counts.

Usage: python tools/vpu_probe.py   (runs on the default backend)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

CLOCK_HZ = 0.94e9  # v5e
K = 400            # fori iterations per grid step
GRID = 8


def _probe_kernel(a_ref, o_ref, acc, *, nchains, dtype, op):
    import jax
    import jax.numpy as jnp

    x = a_ref[:].astype(dtype)
    y = (x * 0.5 + 0.25).astype(dtype)

    def body(i, accs):
        if op == "fma":
            return tuple((a * x + y).astype(dtype) for a in accs)
        return tuple((a * x).astype(dtype) for a in accs)

    def chain_body(i, accs):
        # one serial step per iteration when nchains == 1 models pure
        # latency; independent accs model full ILP
        return body(i, accs)

    accs = tuple(
        (x + jnp.asarray(float(c), dtype)).astype(dtype)
        for c in range(nchains)
    )
    accs = jax.lax.fori_loop(0, K, chain_body, accs)
    s = accs[0]
    for a in accs[1:]:
        s = s + a
    acc[:] = s.astype(jnp.float32)
    o_ref[:] = acc[:]


def measure(name, nchains, dtype_str, op, H=256, W=512):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_str)
    kern = functools.partial(
        _probe_kernel, nchains=nchains, dtype=dtype, op=op)
    a = jnp.asarray(np.random.default_rng(0)
                    .uniform(0.5, 1.0, (H, W)).astype(np.float32))

    @jax.jit
    def run(a):
        return pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            scratch_shapes=[pltpu.VMEM((H, W), jnp.float32)],
        )(a)

    def sync(o):
        return np.asarray(jax.device_get(o[:1, :1]))

    sync(run(a))
    reps = 20
    t0 = time.perf_counter()
    o = None
    for _ in range(reps):
        o = run(a)
    sync(o)
    dt = (time.perf_counter() - t0) / reps

    lanes_per_vreg = 1024 if dtype_str == "float32" else 2048
    vregs_per_plane = H * W // lanes_per_vreg
    vops = GRID * K * nchains * vregs_per_plane
    cycles = dt * CLOCK_HZ
    print(f"{name:>8}: {dt*1e3:7.3f} ms  {vops/cycles:6.3f} vreg-ops/cycle "
          f"({vops/dt/1e9:7.1f} Gvop/s; FLOP/s if all-FMA: "
          f"{2*vops*lanes_per_vreg/dt/1e12:5.2f} T)")
    return vops / cycles


def main():
    import jax
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/tmp/bnlk_jax_cache")
    print(f"backend: {jax.default_backend()}")
    # large planes (128 vregs each): accumulators cannot stay in the
    # register file, so this measures the VMEM-streaming rate — the
    # regime the NL-Kalman/TV-L1 full-plane ops actually run in
    measure("fma8", 8, "float32", "fma")
    measure("fma4", 4, "float32", "fma")
    measure("fma1", 1, "float32", "fma")
    measure("mul8", 8, "float32", "mul")
    measure("fmabf8", 8, "bfloat16", "fma")
    # small planes (4 vregs each, everything register-resident):
    # measures the raw ALU issue ceiling with full ILP
    measure("fma8s", 8, "float32", "fma", H=8, W=512)
    measure("fma4s", 4, "float32", "fma", H=8, W=512)
    measure("mul8s", 8, "float32", "mul", H=8, W=512)
    measure("fmabf8s", 8, "bfloat16", "fma", H=8, W=512)
    # mid-size (32 vregs/plane ~ one (65,512) kernel plane op)
    measure("fma8m", 8, "float32", "fma", H=64, W=512)


if __name__ == "__main__":
    main()

"""Derive the speed-of-light (SOL) target for the window blend kernels.

VERDICT r2 weak #9: ``NOMINAL_TARGET = 100.0`` in bench.py was an unexamined
constant. This script MEASURES the two hardware rates the blend kernels are
bound by — VPU f32 FMA throughput and transcendental (exp) throughput — with
minimal Pallas kernels on the actual chip, then combines them with the
kernels' per-(gaussian, pixel)-pair operation counts and the measured
per-grid-step overhead into a derived SOL frame time for the bench scene.

Writes the derivation to stdout (paste into BASELINE.md) and
ROOFLINE.json with the raw numbers.

Op counts per pair (audited against render/blend_pallas.py):
  forward : dx,dy(2) q(5) alpha(3) scan(3*log2(c)) w(2) rgb(6)  ~= 36 FMA-ops
            + 1 exp
  backward: fwd recompute(10) 2 scans(6*log2(c)) cg(5) contrib(1) s(1)
            dalpha(3 + 1 div~4) dq(2) t1,t2(2) 9 reductions(~18) ~= 64
            + 1 exp
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS, LANES = 8, 256             # one chain = 2 f32 vregs (no spills)
CHAINS = 8                       # independent chains (hide FMA latency)
LOOP = 48                        # fully unrolled iterations per grid step
GRID = 2048


def _fma_kernel(x_ref, o_ref):
    # CHAINS independent vreg-resident FMA chains inside a fori_loop: a
    # single chain is latency-bound and large blocks spill vregs — both
    # understated the VPU 2-4x in earlier versions of this script.
    a = 1.0000001
    b = 1e-7
    xs = tuple(x_ref[...] * (1.0 + 1e-6 * i) for i in range(CHAINS))
    for _ in range(LOOP):        # fully unrolled (Mosaic: unroll 1 or all)
        xs = tuple(x * a + b for x in xs)
    acc = xs[0]
    for x in xs[1:]:
        acc = acc + x
    o_ref[...] = acc


def _exp_kernel(x_ref, o_ref):
    xs = tuple(x_ref[...] * (1.0 + 1e-3 * i) for i in range(CHAINS))
    for _ in range(LOOP // 8):   # fully unrolled
        xs = tuple(jnp.exp(-jnp.abs(x) * 1e-3) for x in xs)
    acc = xs[0]
    for x in xs[1:]:
        acc = acc + x
    o_ref[...] = acc


def _run(kernel):
    call = pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
    )

    @jax.jit
    def run(x, n):
        return jax.lax.fori_loop(
            0, n, lambda i, c: call(x + c * 1e-30)[0, 0] * 1e-30 + c, 0.0)

    x = jnp.ones((ROWS, LANES), jnp.float32)
    float(run(x, 1))

    def timed(n):
        t0 = time.time()
        float(run(x, n))
        return time.time() - t0

    import statistics
    hi, lo = 11, 2
    dt = (statistics.median(timed(hi) for _ in range(5))
          - statistics.median(timed(lo) for _ in range(5))) / (hi - lo)
    return max(dt, 1e-9)


def main():
    backend = jax.default_backend()
    elems = ROWS * LANES * GRID

    t_fma = _run(_fma_kernel)
    fma_rate = elems * CHAINS * LOOP * 2 / t_fma  # flops/s
    t_exp = _run(_exp_kernel)
    # each exp iteration also does abs+mul (~2 flops) — subtract at fma rate
    exp_iters = elems * CHAINS * (LOOP // 8)
    t_exp_pure = t_exp - exp_iters * 2 / fma_rate
    exp_rate = exp_iters / max(t_exp_pure, 1e-9)  # transcendentals/s

    # bench scene geometry (bench.py defaults)
    w, h, chunk = 800, 608, 64
    pairs = 228_000 * 1024       # live window rows x pixels (measured r3)
    step_overhead = 0.3e-6       # s per grid step (profile_window_overhead)
    steps = 3568                 # measured+bucketed window count
    log2c = max(chunk.bit_length() - 1, 1)
    fwd_flops = 28 + 3 * log2c
    bwd_flops = 46 + 6 * log2c

    t_fwd = pairs * fwd_flops / fma_rate + pairs / exp_rate \
        + steps * step_overhead
    t_bwd = pairs * bwd_flops / fma_rate + pairs / exp_rate \
        + steps * step_overhead
    t_frame = t_fwd + t_bwd
    sol_mpix = w * h / t_frame / 1e6

    report = dict(
        backend=backend,
        vpu_f32_flops_per_s=fma_rate,
        exp_per_s=exp_rate,
        fwd_flops_per_pair=fwd_flops,
        bwd_flops_per_pair=bwd_flops,
        pairs=pairs,
        grid_steps=steps,
        step_overhead_s=step_overhead,
        sol_fwd_ms=round(t_fwd * 1e3, 3),
        sol_bwd_ms=round(t_bwd * 1e3, 3),
        sol_frame_ms=round(t_frame * 1e3, 3),
        sol_mpix_per_s=round(sol_mpix, 1),
        note="SOL for the fwd+bwd blend KERNELS alone on the bench scene "
             "(800x608, 100k gaussians, ~228k live window rows); binning "
             "glue and projection excluded.",
    )
    print(json.dumps(report, indent=1))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "ROOFLINE.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()

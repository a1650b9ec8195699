"""Measure instance->gaussian gradient reduction strategies on TPU.

The window blend VJP must fold ~206k grad rows [K*(chunk+8), 16] back onto
100k gaussians. Candidates:
  a) scatter-add by rank (current round-2 code)
  b) gather rows into enumeration order + cumsum + hi-lo boundary gathers
     (round-1 segment-sum trick)
Also times the budget-row gather and cumsum alone.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 100_000
BUDGET = 246_528
KROWS = 4327 * 72  # K * (chunk + WIN_PAD)

rng = np.random.default_rng(0)
drows = jnp.asarray(rng.normal(size=(KROWS, 16)).astype(np.float32))
# ~206k live rows with ranks over N (dups ~2x), rest dead
live = rng.random(KROWS) < (206_000 / KROWS)
idx = np.where(live, rng.integers(0, N, KROWS), N).astype(np.int32)
idx_j = jnp.asarray(idx)
# enum mapping: each of ~206k enumeration slots -> a kernel row
ekr = jnp.asarray(rng.permutation(KROWS)[:BUDGET].astype(np.int32))
evalid = jnp.asarray((rng.random(BUDGET) < 0.84))
enum_start = jnp.asarray(np.sort(rng.integers(0, BUDGET, N)).astype(np.int32))
enum_cnt = jnp.asarray(rng.integers(0, 4, N).astype(np.int32))


def timeit(name, fn, *args):
    @jax.jit
    def run(n, *a):
        return jax.lax.fori_loop(0, n, lambda i, c: fn(c, *a), 0.0)
    float(run(1, *args))
    def t(n):
        t0 = time.time()
        float(run(n, *args))
        return time.time() - t0
    it = 30
    dt = max((min(t(it + 1) for _ in range(2))
              - min(t(1) for _ in range(2))) / it, 1e-9)
    print(f"{name:34s} {dt*1e3:8.2f} ms")


def scatter_add(c, dr, ix):
    out = jnp.zeros((N, 16), jnp.float32).at[ix].add(
        dr + c * 1e-30, mode="drop")
    return out[0, 0] * 1e-30


def seg_sum(c, dr, ek, ev, es, ec):
    rows = dr.at[jnp.minimum(ek, KROWS - 1)].get(mode="clip") + c * 1e-30
    rows = jnp.where(ev[:, None], rows, 0.0)
    cs = jnp.cumsum(rows, axis=0)
    hi = cs.at[jnp.clip(es + ec - 1, 0, BUDGET - 1)].get(mode="clip")
    lo = jnp.where((es > 0)[:, None],
                   cs.at[jnp.maximum(es - 1, 0)].get(mode="clip"), 0.0)
    out = jnp.where((ec > 0)[:, None], hi - lo, 0.0)
    return out[0, 0] * 1e-30


def gather_only(c, dr, ek):
    rows = dr.at[jnp.minimum(ek, KROWS - 1)].get(mode="clip") + c * 1e-30
    return rows[0, 0] * 1e-30


def cumsum_only(c, dr):
    cs = jnp.cumsum(dr[:BUDGET] + c * 1e-30, axis=0)
    return cs[-1, 0] * 1e-30


def spread_cummax(c, ix):
    seed = jnp.zeros((BUDGET,), jnp.int32).at[
        jnp.arange(0, BUDGET, 57)].max(jnp.arange(0, BUDGET, 57))
    sp = jax.lax.cummax(seed + (ix[0] * 0).astype(jnp.int32))
    return sp[-1].astype(jnp.float32) * 1e-30 + c * 0.0


timeit("scatter-add rows->N (current)", scatter_add, drows, idx_j)
timeit("segsum: gather+cumsum+hilo", seg_sum, drows, ekr, evalid,
       enum_start, enum_cnt)
timeit("  gather [budget,16] only", gather_only, drows, ekr)
timeit("  cumsum [budget,16] only", cumsum_only, drows)
timeit("  cummax spread [budget]", spread_cummax, idx_j)

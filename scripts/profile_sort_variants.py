"""Measure sort/gather variants that decide the new binning design."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp

ITERS = 10


def loop_time(name, stage, *args):
    @jax.jit
    def run(n, *a):
        return jax.lax.fori_loop(0, n, lambda i, c: stage(c, *a), 0.0)
    float(run(1, *args))
    def timed(n):
        t0 = time.time(); float(run(n, *args)); return time.time() - t0
    dt_n = min(timed(ITERS + 1), timed(ITERS + 1))
    dt_1 = min(timed(1), timed(1))
    dt = max((dt_n - dt_1) / ITERS, 1e-6)
    print(f"{name:40s} {dt*1e3:8.3f} ms")


def pi(c):
    return (c * 1e-30).astype(jnp.int32)


def s30(x):
    return jnp.sum(x.astype(jnp.float32)) * 1e-30


for B in (246528, 481536):
    key = jax.random.randint(jax.random.PRNGKey(0), (B,), 0, 1 << 30,
                             dtype=jnp.int32)
    rows = jax.random.normal(jax.random.PRNGKey(1), (B, 16), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(2), (B,), 0, B,
                             dtype=jnp.int32)
    jax.block_until_ready((key, rows, idx))
    print(f"--- B={B}", file=sys.stderr)

    def st_sort1(c, k=key):
        return s30(jax.lax.sort(k + pi(c), is_stable=False))

    def st_sort1_stable(c, k=key):
        return s30(jax.lax.sort(k + pi(c), is_stable=True))

    def st_sort_2(c, k=key, r=rows):
        out = jax.lax.sort((k + pi(c), r[:, 0]), num_keys=1, is_stable=False)
        return s30(out[0]) + s30(out[1])

    def st_sort_17(c, k=key, r=rows):
        ops = (k + pi(c),) + tuple(r[:, i] for i in range(16))
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        return sum(s30(o) for o in out)

    def st_sort_5(c, k=key, r=rows):
        ops = (k + pi(c),) + tuple(r[:, i] for i in range(4))
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        return sum(s30(o) for o in out)

    def st_gather_rows(c, r=rows, i=idx):
        return s30(r[jnp.clip(i + pi(c), 0, B - 1)])

    def st_scatter_rows(c, r=rows, i=idx):
        out = jnp.zeros((B + 8, 16), jnp.float32).at[
            jnp.clip(i + pi(c), 0, B - 1)].set(r)
        return s30(out)

    def st_searchsorted_small(c, k=key):
        ks = jax.lax.sort(k + pi(c))
        q = jnp.arange(1024, dtype=jnp.int32) * (1 << 20)
        return s30(jnp.searchsorted(ks, q))

    loop_time(f"sort 1-key B={B}", st_sort1)
    loop_time(f"sort 1-key stable B={B}", st_sort1_stable)
    loop_time(f"sort key+1 payload B={B}", st_sort_2)
    loop_time(f"sort key+4 payloads B={B}", st_sort_5)
    loop_time(f"sort key+16 payloads B={B}", st_sort_17)
    loop_time(f"gather rows [B,16] B={B}", st_gather_rows)
    loop_time(f"scatter rows [B,16] B={B}", st_scatter_rows)
    loop_time(f"sort+searchsorted 1k B={B}", st_searchsorted_small)

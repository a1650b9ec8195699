"""Compile + runtime of the instance-sort formulations at budget size.

current: N-argsort(depth) [18s compile] + single-key i32 sort of
         (tile<<rank_bits | rank) with je payload
proposed: no argsort; one (tile, depth_bits, je) num_keys=2|3 sort
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

N, B = 100_000, 246_528
rng = np.random.default_rng(0)
depth = jnp.asarray(rng.random(N), jnp.float32)
tile = jnp.asarray(np.sort(rng.integers(0, 476, B)).astype(np.int32))
dbits_inst = jnp.asarray(rng.integers(0, 1 << 30, B).astype(np.int32))
je = jnp.arange(B, dtype=jnp.int32)


def bench(name, fn, *args):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    tc = time.time() - t0

    @jax.jit
    def run(n, *a):
        return jax.lax.fori_loop(
            0, n, lambda i, s: fn(*[x + (s * 0).astype(x.dtype)
                                    for x in a]) * 0 + s + 1, 0)
    float(run(1, *args))
    def t(n):
        t0 = time.time(); float(run(n, *args)); return time.time() - t0
    dt = max((min(t(11) for _ in range(2)) - min(t(1) for _ in range(2)))
             / 10, 1e-9)
    print(f"{name:36s} compile {tc:6.1f} s   run {dt*1e3:7.2f} ms")


def cur(depth, tile, je):
    order = jnp.argsort(depth, stable=True).astype(jnp.int32)
    rank = jnp.zeros((N,), jnp.int32).at[order].set(
        jnp.arange(N, dtype=jnp.int32), unique_indices=True)
    key = (tile << 17) | rank[jnp.minimum(je % N, N - 1)]
    keys, jes = jax.lax.sort((key, je), num_keys=1)
    return (keys & 0x1FFFF).sum() + jes.sum()


def sort3(depth, tile, je):
    del depth
    t_s, d_s, je_s = jax.lax.sort((tile, dbits_inst, je), num_keys=3)
    return d_s.sum() + je_s.sum() + t_s.sum()


def sort2(depth, tile, je):
    del depth
    t_s, d_s, je_s = jax.lax.sort((tile, dbits_inst, je), num_keys=2,
                                  is_stable=True)
    return d_s.sum() + je_s.sum() + t_s.sum()


bench("current: argsort + 1-key(+payload)", cur, depth, tile, je)
bench("proposed: 3-key (tile,depth,je)", sort3, depth, tile, je)
bench("alt: 2-key stable (tile,depth)+je", sort2, depth, tile, je)

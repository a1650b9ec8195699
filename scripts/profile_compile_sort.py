"""Compile-time of depth-sort variants at N=100k (argsort = 18s?!)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 100_000
depth = jnp.asarray(np.random.default_rng(0).random(N), jnp.float32)


def ctime(name, fn):
    t0 = time.time()
    jax.jit(fn).lower(depth).compile()
    print(f"{name:34s} {time.time()-t0:7.1f} s")


def v_argsort_stable(d):
    return jnp.argsort(d, stable=True).astype(jnp.int32).sum()


def v_argsort_unstable(d):
    return jnp.argsort(d, stable=False).astype(jnp.int32).sum()


def v_sort_payload(d):
    i = jnp.arange(N, dtype=jnp.int32)
    _, o = jax.lax.sort((d, i), num_keys=1, is_stable=True)
    return o.sum()


def v_sort_payload_unstable(d):
    i = jnp.arange(N, dtype=jnp.int32)
    _, o = jax.lax.sort((d, i), num_keys=1, is_stable=False)
    return o.sum()


def v_bits2key(d):
    # positive f32 bits are order-isomorphic to their i32 pattern;
    # two-key unique sort = deterministic stable-equivalent
    b = jax.lax.bitcast_convert_type(d, jnp.int32)
    i = jnp.arange(N, dtype=jnp.int32)
    _, o = jax.lax.sort((b, i), num_keys=2, is_stable=False)
    return o.sum()


def v_i64_packed(d):
    b = jax.lax.bitcast_convert_type(d, jnp.int32).astype(jnp.int64)
    i = jnp.arange(N, dtype=jnp.int32)
    key = (b << 17) | i.astype(jnp.int64)
    k = jax.lax.sort(key, is_stable=False)
    return (k & ((1 << 17) - 1)).astype(jnp.int32).sum()


def v_singlekey_i32(d):
    # like the instance sort that compiles in ~1s: one i32 array, no payload
    b = jax.lax.bitcast_convert_type(d, jnp.int32)
    return jax.lax.sort(b, is_stable=False).sum()


for name, fn in [
    ("argsort stable (current)", v_argsort_stable),
    ("argsort unstable", v_argsort_unstable),
    ("lax.sort (f32 key, i32 payload)", v_sort_payload),
    ("  same, unstable", v_sort_payload_unstable),
    ("2-key (bits, iota) unstable", v_bits2key),
    ("i64 packed single key", v_i64_packed),
    ("single i32 key, no payload", v_singlekey_i32),
]:
    ctime(name, fn)

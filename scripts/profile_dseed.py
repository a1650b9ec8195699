"""Why does the VJP's d-seed ([T,8,P] elementwise) cost ~2ms? Try layouts."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

T, P = 475, 1024
out_t = jnp.zeros((T, 8, P), jnp.float32)
g_t = out_t + 1.0
ITERS = 20


def timeit(name, fn, *args):
    def stage(c, *a):
        a0 = a[0] + c * 1e-30
        o = fn(a0, *a[1:])
        return o.reshape(-1)[0] * 1e-30

    @jax.jit
    def run(n, *a):
        return jax.lax.fori_loop(0, n, lambda i, c: stage(c, *a), 0.0)

    float(run(1, *args))
    def timed(n):
        t0 = time.perf_counter()
        float(run(n, *args))
        return time.perf_counter() - t0
    dt_n = min(timed(ITERS + 1), timed(ITERS + 1))
    dt_1 = min(timed(1), timed(1))
    print(f"{name:40s}{max(dt_n - dt_1, 0) / ITERS * 1e3:8.3f} ms")


timeit("copy [T,8,P] (calibration)", lambda o: o + 1.0, out_t)

def v_current(out, g):
    grgb = g[:, 0:3, :]
    gt = g[:, 3:4, :]
    return (jnp.sum(out[:, 0:3, :] * grgb, axis=1, keepdims=True)
            + out[:, 3:4, :] * gt)

timeit("current (slice+sum axis1)", v_current, out_t, g_t)

def v_unroll(out, g):
    return (out[:, 0, :] * g[:, 0, :] + out[:, 1, :] * g[:, 1, :]
            + out[:, 2, :] * g[:, 2, :] + out[:, 3, :] * g[:, 3, :])[:, None]

timeit("unrolled sublane slices", v_unroll, out_t, g_t)

def v_full8(out, g):
    # multiply all 8 rows, zero rows 4..7 of g beforehand is free in the VJP
    # (g rows 4+ are zero cotangents); reduce over the full sublane axis
    return jnp.sum(out * g, axis=1, keepdims=True)

timeit("full 8-row mul+sum", v_full8, out_t, g_t)

def v_dot(out, g):
    o2 = out.reshape(T, 8 * P)
    return o2  # layout probe only

timeit("reshape [T,8P] probe", v_dot, out_t, g_t)

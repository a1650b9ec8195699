"""Compare sublane-scan implementations for the blend kernels.

The inclusive cumprod/cumsum over the chunk (sublane) axis costs
log2(chunk) shift-combines over the full (chunk, P) block — 18 of the
~31 forward ops per (gaussian, pixel). A two-level scheme (intra-group
Sklansky + group-total spread) does 3 full-size steps + small-group work.
Checks exactness in interpret mode, then times both inside a minimal
Pallas kernel on the TPU.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK, P, GROUP = 64, 1024, 8


def scan_flat(x, combine, identity):
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < x.shape[0]:
        sh = pltpu.roll(x, shift=k, axis=0)
        x = combine(x, jnp.where(row >= k, sh, identity))
        k *= 2
    return x


def scan_grouped(x, combine, identity, group=GROUP):
    """Two-level scan: log2(group) masked shifts at FULL size, then the
    group-total scan + exclusive shift run on the (n/group, P) extraction,
    spread back with pltpu.repeat — 3+1 full-size ops vs 6 for the flat
    Sklansky scan at chunk=64."""
    n = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    # intra-group inclusive scan (masks stop carries at group boundaries)
    k = 1
    y = x
    while k < group:
        sh = pltpu.roll(y, shift=k, axis=0)
        y = combine(y, jnp.where(row % group >= k, sh, identity))
        k *= 2
    # group totals: last row of each group, scanned exclusively at 1/group
    # the full width
    t = jax.lax.slice(y, (group - 1, 0), (n, x.shape[1]), (group, 1))
    m = t.shape[0]
    trow = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    k = 1
    while k < m:
        sh = pltpu.roll(t, shift=k, axis=0)
        t = combine(t, jnp.where(trow >= k, sh, identity))
        k *= 2
    te = jnp.where(trow >= 1, pltpu.roll(t, shift=1, axis=0), identity)
    # element-repeat each group prefix down its group (broadcast+reshape;
    # NB pltpu.repeat TILES the array rather than repeating elements)
    spread = jnp.broadcast_to(te[:, None, :], (m, group, x.shape[1])
                              ).reshape(n, x.shape[1])
    return combine(y, spread)


def _check():
    rng = np.random.default_rng(0)
    x = rng.random((CHUNK, 128)).astype(np.float32) * 0.5 + 0.5

    def k_prod(x_ref, o_ref):
        o_ref[...] = scan_grouped(x_ref[...], jnp.multiply, 1.0)

    def k_sum(x_ref, o_ref):
        o_ref[...] = scan_grouped(x_ref[...], jnp.add, 0.0)

    call = lambda k: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        interpret=True)(jnp.asarray(x))
    err = np.abs(np.cumprod(x, 0) - np.asarray(call(k_prod))).max()
    errs = np.abs(np.cumsum(x, 0) - np.asarray(call(k_sum))).max()
    print(f"grouped cumprod max err vs numpy: {err:.2e}")
    print(f"grouped cumsum  max err vs numpy: {errs:.2e}")
    assert err < 1e-5 and errs < 1e-3


def kernel(which, x_ref, o_ref):
    x = x_ref[...]
    f = scan_flat if which == "flat" else scan_grouped
    # emulate the kernels' load: cumprod + cumsum back to back, x4 rounds
    # to dominate fixed costs
    acc = x
    for _ in range(4):
        a = f(acc, jnp.multiply, 1.0)
        b = f(a, jnp.add, 0.0)
        acc = b * 1e-6 + x
    o_ref[...] = acc


def bench(which, interpret):
    fn = pl.pallas_call(
        functools.partial(kernel, which),
        grid=(1024,),
        in_specs=[pl.BlockSpec((CHUNK, P), lambda k: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CHUNK, P), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CHUNK, P), jnp.float32),
        interpret=interpret,
    )
    x = jnp.asarray(np.random.default_rng(0).random((CHUNK, P)),
                    jnp.float32) * 0.5 + 0.5

    @jax.jit
    def run(n, x):
        return jax.lax.fori_loop(0, n, lambda i, c: fn(x + c * 1e-30)[0, 0],
                                 0.0)

    float(run(1, x))
    t0 = time.time(); float(run(20, x)); t1 = time.time()
    t0b = time.time(); float(run(1, x)); t1b = time.time()
    dt = ((t1 - t0) - (t1b - t0b)) / 19
    print(f"{which:8s} {dt*1e3:7.3f} ms / call (1024 grid steps x 8 scans)")


if __name__ == "__main__":
    _check()
    interpret = jax.default_backend() not in ("tpu", "axon")
    if "--bench" in sys.argv:
        bench("flat", interpret)
        bench("grouped", interpret)

"""Driver entry points: entry() compile-check + dryrun_multichip in-process
(conftest provides 8 virtual CPU devices)."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (96, 128, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # asserts internally on the loss


def test_bench_importable():
    import bench

    assert callable(bench.main)

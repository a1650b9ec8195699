"""Profiling / timing harness (SURVEY.md section 5.1).

The reference's instrumentation is console.time + an FPS overlay
(gaussians_selection.js:514-528, 1582-1634); here:

- ``device_timer``: robust steady-state timing of a jitted step. On the
  axon remote-TPU backend ``block_until_ready`` does NOT block, so the only
  reliable sync is fetching a scalar; we run the step n times in an
  on-device fori_loop (with a ~1e-30 data perturbation so XLA cannot hoist
  it) and subtract a 1-iteration baseline to cancel dispatch latency.
- ``Throughput``: converts step times into the BASELINE.md metrics
  (Mpix/s, gaussians-blended/s, steps/s).
- ``trace``: jax.profiler wrapper for Perfetto/XProf dumps.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def fetch_sync(x) -> float:
    """Force execution and fetch one scalar (works on the axon tunnel)."""
    return float(jnp.asarray(x).reshape(-1)[0])


def device_timer(
    step_fn: Callable,
    args,
    *,
    iters: int = 20,
    perturb: Optional[Callable] = None,
) -> float:
    """Seconds per call of ``step_fn(*args, loop_carry)``.

    ``step_fn`` must return a scalar depending on its inputs and on the
    float carry ``c`` (mix in ``c * 1e-30``); ``perturb(args, c)`` may
    instead thread the carry into the inputs.
    """

    @jax.jit
    def run(args, n):
        def body(i, c):
            a = perturb(args, c) if perturb else args
            return step_fn(*a, c)
        return jax.lax.fori_loop(0, n, body, 0.0)

    fetch_sync(run(args, 1))  # compile + warm
    t0 = time.time()
    fetch_sync(run(args, iters + 1))
    dt_n = time.time() - t0
    t0 = time.time()
    fetch_sync(run(args, 1))
    dt_1 = time.time() - t0
    return max((dt_n - dt_1) / iters, 1e-9)


class Throughput:
    """Accumulate step timings into named rate metrics."""

    def __init__(self) -> None:
        self.records: Dict[str, Dict[str, float]] = {}

    def record(self, name: str, seconds: float, *,
               pixels: Optional[int] = None,
               gaussians_blended: Optional[int] = None) -> Dict[str, float]:
        rec: Dict[str, float] = {"seconds": seconds,
                                 "steps_per_s": 1.0 / seconds}
        if pixels is not None:
            rec["mpix_per_s"] = pixels / seconds / 1e6
        if gaussians_blended is not None:
            rec["gaussians_blended_per_s"] = gaussians_blended / seconds
        self.records[name] = rec
        return rec

    def report(self) -> str:
        lines = []
        for name, rec in self.records.items():
            parts = [f"{rec['seconds']*1e3:.2f} ms"]
            if "mpix_per_s" in rec:
                parts.append(f"{rec['mpix_per_s']:.1f} Mpix/s")
            if "gaussians_blended_per_s" in rec:
                parts.append(
                    f"{rec['gaussians_blended_per_s']/1e9:.2f} G splats/s")
            lines.append(f"{name}: " + ", ".join(parts))
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gsplat_trace"):
    """jax.profiler trace context (open in XProf/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()

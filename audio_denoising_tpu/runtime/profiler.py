"""Tracing/profiling subsystem (SURVEY §5: the reference's only tracing is
a commented-out timing block, server.py:153-165).

Two layers:

- ``device_trace``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable XLA trace of the serving graph.
- ``StageProfile``: host-side per-stage latency recorder for the serving
  loop (p50/p90/p99 per 20 ms hop — the BASELINE headline metric), built
  on runtime.metrics.ServingMetrics.
"""

import contextlib
import os
import time
from typing import Callable, Dict, Optional

import numpy as np

from audio_denoising_tpu.runtime.metrics import ServingMetrics


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/adt_trace"):
    """XLA device trace; view with TensorBoard's profile plugin."""
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StageProfile:
    """Measure a jitted step function hop-by-hop.

    ``measure(step, args, iters)`` returns {p50_ms, p90_ms, p99_ms, mean_ms}
    with one block_until_ready per hop (true end-to-end latency including
    dispatch), plus an amortized number from scanning ``chain`` hops inside
    one dispatch (the chip-only rate — dispatch excluded)."""

    def __init__(self):
        self.metrics = ServingMetrics(window=4096)

    def measure_dispatch(self, fn: Callable, *args, iters: int = 50,
                         stage: str = "step") -> Dict[str, float]:
        import jax
        out = fn(*args)
        jax.block_until_ready(out)
        for _ in range(iters):
            with self.metrics.timer(stage):
                out = fn(*args)
                jax.block_until_ready(out)
        return self.metrics.summary()[stage]

    @staticmethod
    def measure_amortized(make_scan: Callable, iters: int = 10,
                          chain: int = 50) -> float:
        """make_scan(chain) -> zero-arg callable running `chain` dependent
        hops in one dispatch; returns per-hop milliseconds."""
        import jax
        fn = make_scan(chain)
        jax.block_until_ready(fn())
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append((time.perf_counter() - t0) / chain * 1e3)
        return float(np.median(ts))

"""Serving observability: per-stage timers, deadline tracking, counters.

The reference's observability is print statements and UI panels (SURVEY §5);
here metrics are structured and cheap (host-side monotonic clocks around
device steps, percentile summaries on demand).
"""

import time
from collections import defaultdict, deque
from typing import Dict


class ServingMetrics:
    def __init__(self, window: int = 1024):
        self._lat = defaultdict(lambda: deque(maxlen=window))
        self._counters = defaultdict(int)

    def observe(self, stage: str, seconds: float) -> None:
        self._lat[stage].append(seconds)

    def count(self, name: str, inc: int = 1) -> None:
        self._counters[name] += inc

    def timer(self, stage: str):
        metrics = self

        class _Timer:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                metrics.observe(stage, time.perf_counter() - self.t0)

        return _Timer()

    def percentile(self, stage: str, q: float) -> float:
        xs = sorted(self._lat[stage])
        if not xs:
            return float("nan")
        idx = min(len(xs) - 1, int(q / 100.0 * len(xs)))
        return xs[idx]

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for stage in self._lat:
            out[stage] = {
                "p50_ms": 1e3 * self.percentile(stage, 50),
                "p90_ms": 1e3 * self.percentile(stage, 90),
                "p99_ms": 1e3 * self.percentile(stage, 99),
                "n": float(len(self._lat[stage])),
            }
        out["counters"] = dict(self._counters)
        return out

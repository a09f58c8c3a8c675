"""Profiling hooks: jax.profiler traces + simple stage timers.

The reference has only ad-hoc time.time() deltas (SURVEY.md section 5);
here: `trace(log_dir)` context manager captures a TensorBoard-viewable
device trace around any code region, and `StageTimer` aggregates named
host-side stage durations (kept for BOP per-image time accounting parity,
compute_bop_results_m3.py:175-177).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace into log_dir (view in
    TensorBoard's profile plugin or Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulate named stage wall-times; `summary()` -> {name: (total, n)}."""

    def __init__(self):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._totals[name] += dt
            self._counts[name] += 1

    def total(self, name: str) -> float:
        return self._totals[name]

    def mean(self, name: str) -> float:
        n = self._counts[name]
        return self._totals[name] / n if n else 0.0

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self._totals[k], "count": self._counts[k],
                "mean_s": self.mean(k)}
            for k in self._totals
        }

"""Tracing / profiling helpers — green-field vs the reference, whose only
instrumentation is coarse walltime scripts (SURVEY.md §5): jax.profiler
trace capture around training steps and a lightweight per-stage step
timer whose numbers feed the metric logger."""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


class StepTimer:
    """Named-stage wall-clock accounting for host-side loops.

    with timer.stage("data"): batch = next(stream)
    with timer.stage("step"): state, losses = step_fn(state, batch)
    """

    def __init__(self):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._totals[name] += time.perf_counter() - t0
            self._counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self._totals[name],
                "count": self._counts[name],
                "mean_ms": 1e3 * self._totals[name] / max(self._counts[name], 1),
            }
            for name in self._totals
        }

    def log_summary(self, log=None) -> None:
        log = log or logger.info
        for name, s in sorted(self.summary().items()):
            log(f"{name}: {s['mean_ms']:.2f} ms/call over {s['count']} calls")

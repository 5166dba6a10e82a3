"""Windowed running-mean metric logger (fs_mol/utils/metric_logger.py:7-64).

Collects scalar metrics, logs windowed means every `window_size` steps,
and keeps full history for end-of-run summaries. The reference's AzureML
forwarding is generalized to an optional `report_fn` callback (hook up
TensorBoard/W&B/anything there).
"""

from __future__ import annotations

import logging
from collections import defaultdict
from typing import Callable, Dict, List, Optional


class MetricLogger:
    def __init__(
        self,
        log_fn: Optional[Callable[[str], None]] = None,
        window_size: int = 10,
        quiet: bool = False,
        report_fn: Optional[Callable[[str, float], None]] = None,
    ):
        self._log_fn = log_fn or logging.getLogger(__name__).info
        self._window_size = window_size
        self._quiet = quiet
        self._report_fn = report_fn
        self._window: Dict[str, List[float]] = defaultdict(list)
        self._history: Dict[str, List[float]] = defaultdict(list)
        self._num_updates = 0

    def log_metrics(self, **metrics: float) -> None:
        self._num_updates += 1
        for name, value in metrics.items():
            value = float(value)
            self._window[name].append(value)
            self._history[name].append(value)
            if self._report_fn is not None:
                self._report_fn(name, value)
        if self._num_updates % self._window_size == 0:
            self._flush_window()

    def _flush_window(self) -> None:
        if not self._quiet:
            parts = [
                f"{name} {sum(vals) / len(vals):.5f}"
                for name, vals in sorted(self._window.items())
                if vals
            ]
            if parts:
                self._log_fn(f"[step {self._num_updates}] " + ", ".join(parts))
        self._window.clear()

    def get_mean(self, name: str, last_n: Optional[int] = None) -> float:
        hist = self._history[name]
        if last_n is not None:
            hist = hist[-last_n:]
        return sum(hist) / max(len(hist), 1)

    @property
    def history(self) -> Dict[str, List[float]]:
        return dict(self._history)

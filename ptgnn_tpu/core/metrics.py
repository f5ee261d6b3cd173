"""Metric accumulation across steps.

Replaces the reference's mutable ModuleWithMetrics counters
(modulewithmetrics.py:8-77) with a pure scheme: each jitted step returns a
dict of scalar *accumulators* (counts, sums); the host sums them across steps
and the task module's ``finalize_metrics`` turns sums into reported values.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


class MetricsAccumulator:
    def __init__(self):
        self._sums: Dict[str, Any] = {}

    def update(self, step_metrics: Mapping[str, Any]) -> None:
        for key, value in step_metrics.items():
            value = np.asarray(value, dtype=np.float64)
            if key in self._sums:
                self._sums[key] = self._sums[key] + value
            else:
                self._sums[key] = value

    def totals(self) -> Dict[str, float]:
        return {k: float(v) for k, v in self._sums.items()}

    def reset(self) -> None:
        self._sums = {}

    def __len__(self) -> int:
        return len(self._sums)

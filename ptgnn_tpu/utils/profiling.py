"""Profiling and roofline accounting.

The reference has no profiler integration (SURVEY.md §5); it only logs
samples/sec. Here:

* ``profile_trace`` wraps ``jax.profiler.trace`` for TensorBoard-viewable
  device traces (note: unsupported through remote-tunnel runtimes — it may
  hang there; works on directly attached devices and CPU);
* ``mp_layer_roofline`` gives per-layer FLOP/byte estimates for the unified
  layout so throughput numbers can be compared against hardware ceilings;
* ``Throughput`` accumulates the reference-style graphs/nodes/edges-per-sec
  counters (trainer wires these automatically from the GNN's metrics).
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Dict, Optional


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


@dataclass(frozen=True)
class LayerRoofline:
    flops: int
    hbm_bytes: int

    def arithmetic_intensity(self) -> float:
        return self.flops / max(self.hbm_bytes, 1)

    def time_bounds_ms(
        self, peak_flops: float = 197e12, peak_bw: float = 819e9
    ) -> Dict[str, float]:
        """Lower bounds at the given peaks (defaults: v5e bf16)."""
        return {
            "compute_ms": self.flops / peak_flops * 1e3,
            "memory_ms": self.hbm_bytes / peak_bw * 1e3,
        }


def mp_layer_roofline(
    edge_slots: int,
    state_dim: int,
    message_dim: int,
    num_nodes: int,
    *,
    use_target_state: bool = True,
    bytes_per_el: int = 2,
    backward: bool = True,
) -> LayerRoofline:
    """FLOP/byte estimate for one MP layer over the unified layout."""
    din = state_dim * (2 if use_target_state else 1)
    matmul_flops = 2 * edge_slots * din * message_dim
    gather_bytes = edge_slots * din * bytes_per_el
    agg_bytes = edge_slots * message_dim * bytes_per_el + num_nodes * message_dim * 4
    fwd_flops = matmul_flops
    fwd_bytes = gather_bytes + agg_bytes
    mult = 3 if backward else 1  # fwd + grad-input + grad-weight passes
    return LayerRoofline(flops=fwd_flops * mult, hbm_bytes=fwd_bytes * mult)


class Throughput:
    """Walltime-windowed throughput counters (graphs/nodes/edges per sec),
    matching the reference's epoch reporting (trainer.py:256-261)."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._start: Optional[float] = None
        self.totals: Dict[str, float] = {}

    def update(self, **counts: float) -> None:
        if self._start is None:
            self._start = time.time()
        for key, value in counts.items():
            self.totals[key] = self.totals.get(key, 0.0) + float(value)

    def rates(self) -> Dict[str, float]:
        if self._start is None:
            return {}
        elapsed = max(time.time() - self._start, 1e-9)
        return {f"{k}_per_sec": v / elapsed for k, v in self.totals.items()}

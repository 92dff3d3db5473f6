"""Stage timers and profiling hooks.

Equivalent of the reference's CudaTimer / CppTimer tick-tock pairs wrapping
every pipeline stage (reference: Library/MnBase/Profile/CudaTimers.cuh:10-50,
CppTimers.hpp:12-38; usage gmpm_simulator.cuh:332-346).  On TPU the analogue
is wall time around ``block_until_ready`` plus ``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import jax


class StageTimer:
    """tick()/tock(tag) accumulating per-stage wall times.

    ``tock`` blocks on the given JAX value so device work is included —
    the moral of cudaEventElapsedTime."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.records: Dict[str, List[float]] = defaultdict(list)
        self._t0: Optional[float] = None

    def tick(self):
        if self.enabled:
            self._t0 = time.perf_counter()

    def tock(self, tag: str, value=None):
        if not self.enabled:
            return 0.0
        if value is not None:
            jax.block_until_ready(value)
        dt = time.perf_counter() - self._t0
        self.records[tag].append(dt)
        return dt

    @contextlib.contextmanager
    def stage(self, tag: str):
        self.tick()
        out = {}
        yield out
        self.tock(tag, out.get("value"))

    def summary(self) -> List[Tuple[str, float, float, int]]:
        """[(tag, total_s, mean_ms, count)] sorted by total."""
        rows = [
            (tag, sum(v), 1e3 * sum(v) / len(v), len(v))
            for tag, v in self.records.items()
        ]
        return sorted(rows, key=lambda r: -r[1])

    def report(self) -> str:
        lines = [f"{'stage':30s} {'total s':>9s} {'mean ms':>9s} {'count':>6s}"]
        for tag, tot, mean, cnt in self.summary():
            lines.append(f"{tag:30s} {tot:9.3f} {mean:9.3f} {cnt:6d}")
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace for TensorBoard / xprof (replaces -lineinfo +
    Nsight in the reference build, CMake-Utils/setup_cuda.cmake:50)."""
    with jax.profiler.trace(logdir):
        yield

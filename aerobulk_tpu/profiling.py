"""Lightweight observability: per-stage timers + jax.profiler hooks.

The reference has no tracing at all (its closest analogue is a handful of
debug PRINT flags, SURVEY.md §5).  Here: a ``stage`` context manager that
wall-times named stages (forcing host reads, device put, compile, step,
writeback), an optional ``jax.profiler`` trace directory for full XLA/TPU
profiles, and a tiny report.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

__all__ = ["Profiler", "profiler", "slope_time"]


def slope_time(chained_run, m1: int = 1, m2: int = 5,
               repeats: int = 3) -> float:
    """Marginal wall time of one dispatch, by SLOPE.

    On a remote-tunneled TPU the fixed per-dispatch/sync overhead (tens of
    ms) dwarfs small workloads, and ``block_until_ready`` is not a
    reliable completion sync (see CLAUDE.md / bench.py).  Sustained
    throughput is therefore measured as (t(m2) - t(m1)) / (m2 - m1) over
    chained dispatches: fixed overheads cancel exactly.

    ``chained_run(m)`` must issue m argument-distinct, serially-dependent
    dispatches and return a small array whose value depends on all of
    them (otherwise XLA hoists loop-invariant work and you time one
    step); the host ``np.asarray`` here is the true completion sync.
    """
    import numpy as np

    # warm every distinct executable (compile outside the timed region)
    np.asarray(chained_run(m2))
    slopes = []
    for _ in range(repeats):
        t = {}
        for m in (m1, m2):
            t0 = time.perf_counter()
            np.asarray(chained_run(m))
            t[m] = time.perf_counter() - t0
        slopes.append((t[m2] - t[m1]) / (m2 - m1))
    # median: a transient host-contention spike skews one repeat's slope
    return max(float(np.median(slopes)), 1e-9)


class Profiler:
    """Accumulating wall-clock stage timer.

    >>> prof = Profiler()
    >>> with prof.stage("compute"):
    ...     out = step(x)
    ...     jax.block_until_ready(out)
    >>> print(prof.report())
    """

    def __init__(self, trace_dir: Optional[str] = None):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.trace_dir = trace_dir

    @contextlib.contextmanager
    def stage(self, name: str, block: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block:
                # ensure async dispatch is included in this stage
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    @contextlib.contextmanager
    def device_trace(self):
        """Wrap a region in a jax.profiler trace (TensorBoard format)."""
        if self.trace_dir is None:
            yield
            return
        jax.profiler.start_trace(self.trace_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    def report(self) -> str:
        lines = [f"{'stage':<24s} {'calls':>6s} {'total[s]':>10s} "
                 f"{'mean[ms]':>10s}"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            tot = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name:<24s} {n:>6d} {tot:>10.3f} "
                         f"{tot / n * 1e3:>10.2f}")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


#: module-level default instance for casual use
profiler = Profiler()

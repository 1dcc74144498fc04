"""Tracing / profiling utilities.

The reference's only profiling is PL's ``profiler="simple"`` wall-time
summary (reference: uncertainty_modeling/main.py:69, SURVEY.md §5). Here:

- :class:`StageTimer` — the per-stage wall-time summary (printed at exit),
- :func:`trace` — a ``jax.profiler`` trace context writing TensorBoard-
  viewable traces (set ``VALUES_TPU_TRACE_DIR`` or pass a path); this is
  how the throughput claims are inspected on real hardware.
"""
from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageTimer:
    """Accumulates wall time per named stage; ``summary()`` like PL's
    simple profiler."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = ["stage                          total_s    calls   mean_ms"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            total = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name:<30s} {total:8.3f} {n:8d} "
                         f"{1000 * total / max(n, 1):9.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace context; no-op when no directory is configured."""
    log_dir = log_dir or os.environ.get("VALUES_TPU_TRACE_DIR")
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield

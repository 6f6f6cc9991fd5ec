"""Profiling / tracing hooks (SURVEY.md §5.1 — absent in the reference).

* :func:`trace` — context manager around ``jax.profiler`` producing an
  xprof/TensorBoard trace directory;
* :func:`annotate` — named-scope annotation so kernels and layers are
  attributable in traces;
* :class:`StepTimer` — lightweight wall-clock phase timing for the
  scheduler loop (TTFT / tokens-per-second come from
  ``server/metrics.py``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """``with annotate("block/attn"):`` — shows up in xprof traces."""
    return jax.named_scope(name)


class StepTimer:
    """Accumulates per-phase wall time; blocking is the caller's job."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": round(v, 6),
                    "mean_ms": round(v / self.counts[k] * 1e3, 3),
                    "count": self.counts[k]}
                for k, v in self.totals.items()}

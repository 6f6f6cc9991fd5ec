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


def device_busy_s(log_dir: str) -> Optional[float]:
    """Device busy time (seconds) in the NEWEST ``*.trace.json.gz``
    under ``log_dir``: the union of complete-event spans on device
    pids (process_name contains ``/device:``). Union — not sum — so
    overlapping derived rows (module spans + per-op rows) are not
    double-counted.

    This is the tunnel-independent ground truth for benchmarking: a
    remote chip's wall time = device time + whatever the tunnel takes
    that hour (measured ±20% intra-day drift, BENCHMARKS.md), so A/B
    decisions and roofline fractions should quote device time."""
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz",
                             recursive=True))
    if not paths:
        return None
    ev = json.load(gzip.open(paths[-1]))["traceEvents"]
    names = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in names.items() if "/device:" in n}
    if not dev:
        return None
    spans = sorted((e["ts"], e["ts"] + e["dur"]) for e in ev
                   if e.get("ph") == "X" and e["pid"] in dev
                   and e.get("dur"))
    total, end = 0.0, float("-inf")
    for s, t in spans:
        if s > end:
            total += t - s
            end = t
        elif t > end:
            total += t - end
            end = t
    return total / 1e6 if total else None


def traced_device_s(fn, log_dir: Optional[str] = None) -> Optional[float]:
    """Run ``fn()`` under a profiler trace and return the device busy
    seconds (None if tracing is unavailable — never raises)."""
    import shutil
    import tempfile

    d = log_dir or tempfile.mkdtemp(prefix="devtrace-")
    try:
        with trace(d):
            fn()
        return device_busy_s(d)
    except Exception:
        return None
    finally:
        if log_dir is None:
            shutil.rmtree(d, ignore_errors=True)


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

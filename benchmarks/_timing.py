"""Shared slope-timing helper for the decode microbenches.

Slope timing: run N and 4N iterations of a data-dependent loop inside
one program and report (t_hi - t_lo) / 3N — the tunnel's fixed ~28 ms
per-dispatch cost cancels in the difference (see
microbench_matmul.py). One definition here so the decode microbenches
cannot drift apart (ADVICE round 3).
"""

from __future__ import annotations

import functools
import time


def slope(name, run_n, iters, scale=1, reps=3, unit="us", width=46):
    """Print and return the per-iteration time of ``run_n``.

    ``run_n(n)`` must accept a DYNAMIC ``n`` (e.g. a ``fori_loop`` trip
    count) so each variant compiles once. Under timing noise
    ``t_hi - t_lo`` can come out non-positive — the result is clamped
    to 0 and flagged rather than printed as a negative time.
    """
    lo = functools.partial(run_n, iters)
    hi = functools.partial(run_n, iters * 4)
    lo(), hi()
    t_lo = t_hi = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        lo()
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        hi()
        t_hi = min(t_hi, time.perf_counter() - t0)
    per = (t_hi - t_lo) / (iters * 3) * scale
    mult = {"us": 1e6, "ms": 1e3, "s": 1.0}[unit]
    note = ""
    if per <= 0:
        note = "  (<= 0: noise exceeded the slope; treat as ~0)"
        per = 0.0
    print(f"{name:{width}s} {per * mult:10.1f} {unit}{note}")
    return per

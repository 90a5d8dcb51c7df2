"""Tracing, profiling, and observability.

The reference has no tracing/profiling beyond tqdm bars and prints
(SURVEY.md §5).  TPU-native equivalents provided here:

* ``phase_timer`` — per-phase wall-clock timers with a process-global
  registry and JSON dump.
* ``profile_trace`` — ``jax.profiler`` trace context, gated on a flag/env
  var (``DTT_PROFILE_DIR``), producing TensorBoard-loadable traces.
* ``enable_nan_checks`` — ``jax_debug_nans`` toggle, the closest analog to
  a sanitizer for compiled numerics.
* ``MetricsLogger`` — structured JSONL run metrics alongside the PNG/txt
  artifacts.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional

_PHASE_TIMES: Dict[str, list] = defaultdict(list)


@contextlib.contextmanager
def phase_timer(name: str, log: bool = False):
    """Time a phase; accumulate into the global registry."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _PHASE_TIMES[name].append(dt)
        if log:
            print(f"[timer] {name}: {dt:.3f}s")


def phase_times() -> Dict[str, Dict[str, float]]:
    """Summary of all recorded phases: count / total / mean seconds."""
    return {
        name: {
            "count": len(v),
            "total_s": sum(v),
            "mean_s": sum(v) / len(v),
        }
        for name, v in _PHASE_TIMES.items()
    }


def add_phase_time(name: str, seconds: float) -> None:
    """Record an externally measured duration (e.g. a background thread's
    wall — phase_timer can only time the calling thread's critical path)."""
    _PHASE_TIMES[name].append(seconds)


def dump_phase_times(path: str) -> None:
    with open(path, "w") as f:
        json.dump(phase_times(), f, indent=2)


def reset_phase_times() -> None:
    _PHASE_TIMES.clear()


@contextlib.contextmanager
def profile_trace(trace_dir: Optional[str] = None):
    """jax.profiler trace context; no-op unless a directory is given or
    DTT_PROFILE_DIR is set."""
    import jax

    trace_dir = trace_dir or os.environ.get("DTT_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"[profiler] trace written to {trace_dir}")


def enable_nan_checks(enable: bool = True) -> None:
    """Turn on jax_debug_nans — compiled-numerics 'sanitizer' analog."""
    import jax

    jax.config.update("jax_debug_nans", enable)


class MetricsLogger:
    """Structured JSONL metrics stream for a run (one record per event)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def log(self, event: str, **fields) -> None:
        record = {"event": event, "time": time.time(), **fields}
        self._f.write(json.dumps(record) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()

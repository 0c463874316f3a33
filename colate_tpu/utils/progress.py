"""Structured progress / timing observability.

The reference's only instrumentation is a getrusage CPU-time print at
the end of each mode (coal/coal.cpp:3852-3861).  Here every stage of a
run reports through one hook that renders either human-readable stderr
lines (default) or JSON lines (``COLATE_TPU_LOG=json``) for machine
collection, and the per-stage wall times aggregate into the throughput
counters the benchmarks report (sites/s).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _json_mode() -> bool:
    return os.environ.get("COLATE_TPU_LOG", "").lower() == "json"


def log_event(event: str, **fields) -> None:
    """One structured progress record."""
    if _json_mode():
        rec = {"event": event, "ts": time.time(), **fields}
        print(json.dumps(rec), file=sys.stderr, flush=True)
    else:
        kv = " ".join(f"{k}={v}" for k, v in fields.items())
        print(f"[colate_tpu] {event} {kv}", file=sys.stderr, flush=True)


class StageTimer:
    """Accumulates wall time per pipeline stage.

    >>> st = StageTimer()
    >>> with st.stage("parse"):
    ...     ...
    >>> st.timings["parse"]  # seconds
    """

    def __init__(self):
        self.timings: dict[str, float] = {}

    def stage(self, name: str):
        return _Stage(self, name)

    def report(self, **extra) -> None:
        log_event("timings", **{**self.timings, **extra})


class _Stage:
    def __init__(self, timer: StageTimer, name: str):
        self._t = timer
        self._name = name

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self._t.timings[self._name] = (
            self._t.timings.get(self._name, 0.0) + time.time() - self._t0
        )
        return False


def profile_trace(path: str | None = None):
    """Context manager starting a JAX profiler trace when path (or
    ``COLATE_TPU_TRACE``) is set; no-op otherwise.  View with
    TensorBoard / xprof."""
    import contextlib

    path = path or os.environ.get("COLATE_TPU_TRACE")
    if not path:
        return contextlib.nullcontext()
    import jax

    return jax.profiler.trace(path)

"""Structured metrics, phase timing and profiler tracing.

The reference has no observability at all — its only "tracing" is
``fmt.Println`` progress lines in the Go demo (main.go:86-143) and
pprof appears solely as an indirect go.mod dependency (SURVEY.md §5).
This module is the TPU-native replacement the survey calls for:

  * :func:`phase` — a context manager timing a named pipeline stage
    (lowering / commit / ntt / msm / open / verify...). Nested phases
    produce dotted paths (``prove.round3.quotient``). Each phase is
    also a ``jax.profiler.TraceAnnotation`` so stages show up as named
    spans in TensorBoard/XProf traces.
  * counters — monotonically accumulated named values (constraints
    lowered, MSM points, NTT butterflies) via :func:`count`.
  * structured emission — when ``NOIRTPU_METRICS`` is set (or
    :func:`enable` is called) every finished top-level phase prints ONE
    JSON line to stderr: ``{"event": "phase", "name": ..., "ms": ...,
    "children": {...}, "counters": {...}}``.
  * :func:`profiler_trace` — env-gated wrapper around
    ``jax.profiler.trace``: set ``NOIRTPU_PROFILE=/dir`` and any phase
    named in ``NOIRTPU_PROFILE_PHASES`` (default: all top-level)
    records an XLA trace there.

Timing note: phase times are host wall-clock. JAX dispatch is async, so
a phase's time is attributed where the host *blocks* (transcript
absorbs, ``to_ints`` transfers) — which in this prover coincides with
the protocol's round boundaries, exactly the granularity gnark logs
internally. For op-level truth use the profiler trace, not the timers.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import threading
import time
from dataclasses import dataclass, field


@dataclass
class _PhaseRecord:
    name: str
    ms: float = 0.0
    calls: int = 0
    children: dict = field(default_factory=dict)

    def as_dict(self) -> dict:
        d = {"ms": round(self.ms, 3), "calls": self.calls}
        if self.children:
            d["children"] = {k: v.as_dict() for k, v in self.children.items()}
        return d


class Collector:
    """Thread-local phase stack over a shared, lock-guarded tree."""

    def __init__(self):
        self._lock = threading.Lock()
        self._local = threading.local()
        self.reset()

    # -- state -----------------------------------------------------------

    def reset(self) -> None:
        with self._lock:
            self.root = _PhaseRecord("")
            self.counters: dict = {}

    def _stack(self):
        st = getattr(self._local, "stack", None)
        if st is None:
            st = self._local.stack = []
        return st

    # -- phases ------------------------------------------------------------

    @contextlib.contextmanager
    def phase(self, name: str):
        stack = self._stack()
        parent = stack[-1] if stack else self.root
        with self._lock:
            rec = parent.children.setdefault(name, _PhaseRecord(name))
        stack.append(rec)
        annot = _trace_annotation(name)
        t0 = time.perf_counter()
        try:
            if annot is not None:
                with annot:
                    yield rec
            else:
                yield rec
        finally:
            dt = (time.perf_counter() - t0) * 1e3
            stack.pop()
            with self._lock:
                rec.ms += dt
                rec.calls += 1
            if not stack and _emission_enabled():
                self._emit(rec)

    # -- counters ----------------------------------------------------------

    def count(self, name: str, value=1) -> None:
        with self._lock:
            self.counters[name] = self.counters.get(name, 0) + value

    # -- emission ------------------------------------------------------------

    def _emit(self, rec: _PhaseRecord) -> None:
        line = {
            "event": "phase",
            "name": rec.name,
            **rec.as_dict(),
        }
        with self._lock:
            if self.counters:
                line["counters"] = dict(self.counters)
        print(json.dumps(line), file=sys.stderr, flush=True)

    def snapshot(self) -> dict:
        """Full metrics tree + counters (for tests / bench details)."""
        with self._lock:
            return {
                "phases": {k: v.as_dict() for k, v in self.root.children.items()},
                "counters": dict(self.counters),
            }


_GLOBAL = Collector()
_ENABLED_OVERRIDE: bool | None = None


def _emission_enabled() -> bool:
    if _ENABLED_OVERRIDE is not None:
        return _ENABLED_OVERRIDE
    return bool(os.environ.get("NOIRTPU_METRICS"))


def enable(on: bool = True) -> None:
    """Force structured emission on/off (overrides NOIRTPU_METRICS)."""
    global _ENABLED_OVERRIDE
    _ENABLED_OVERRIDE = on


def phase(name: str):
    return _GLOBAL.phase(name)


def count(name: str, value=1) -> None:
    _GLOBAL.count(name, value)


def reset() -> None:
    _GLOBAL.reset()


def snapshot() -> dict:
    return _GLOBAL.snapshot()


# ---------------------------------------------------------------------------
# Profiler integration
# ---------------------------------------------------------------------------


def _trace_annotation(name: str):
    """Named XProf span for this phase, if jax is importable."""
    try:
        import jax.profiler

        return jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover - jax always present in practice
        return None


@contextlib.contextmanager
def profiler_trace(name: str):
    """Record an XLA profiler trace for this block if NOIRTPU_PROFILE=/dir.

    NOIRTPU_PROFILE_PHASES (comma list) restricts which names record;
    unset = every profiler_trace() block records.
    """
    out_dir = os.environ.get("NOIRTPU_PROFILE")
    wanted = os.environ.get("NOIRTPU_PROFILE_PHASES")
    active = bool(out_dir) and (not wanted or name in wanted.split(","))
    if not active:
        yield
        return
    import jax.profiler

    with jax.profiler.trace(os.path.join(out_dir, name)):
        yield

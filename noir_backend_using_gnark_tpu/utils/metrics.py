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


def _merge(dst: _PhaseRecord, src: _PhaseRecord) -> None:
    """Accumulate src's timings into dst, recursively (caller holds lock)."""
    dst.ms += src.ms
    dst.calls += src.calls
    for name, child in src.children.items():
        _merge(dst.children.setdefault(name, _PhaseRecord(name)), child)


class Collector:
    """Thread-local phase stack over a shared, lock-guarded tree.

    Each *top-level* phase invocation records into a fresh, thread-private
    subtree that is merged into the persistent tree on exit — so the
    per-phase JSON line reports THAT call's ms/calls and the counter
    *deltas* since the call started (a second prove in one process is no
    longer polluted by the first's cumulative totals), while
    :func:`snapshot` still exposes the process-lifetime aggregate.
    """

    def __init__(self):
        self._lock = threading.Lock()
        self._local = threading.local()
        self.reset()

    # -- state -----------------------------------------------------------

    def reset(self) -> None:
        with self._lock:
            self.root = _PhaseRecord("")
            self.counters: dict = {}
            self.gauges: dict = {}

    def _stack(self):
        st = getattr(self._local, "stack", None)
        if st is None:
            st = self._local.stack = []
        return st

    # -- phases ------------------------------------------------------------

    @contextlib.contextmanager
    def phase(self, name: str):
        stack = self._stack()
        top_level = not stack
        if top_level:
            # Fresh per-call subtree; merged into the shared tree on exit.
            rec = _PhaseRecord(name)
            with self._lock:
                counters_at_start = dict(self.counters)
        else:
            rec = stack[-1].children.setdefault(name, _PhaseRecord(name))
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
            rec.ms += dt
            rec.calls += 1
            if top_level:
                with self._lock:
                    _merge(self.root.children.setdefault(name, _PhaseRecord(name)), rec)
                    counter_delta = {
                        k: v - counters_at_start.get(k, 0)
                        for k, v in self.counters.items()
                        if v != counters_at_start.get(k, 0)
                    }
                    gauges_now = dict(self.gauges)
                if _emission_enabled():
                    self._emit(rec, counter_delta, gauges_now)

    # -- counters ----------------------------------------------------------

    def count(self, name: str, value=1) -> None:
        with self._lock:
            self.counters[name] = self.counters.get(name, 0) + value

    def gauge(self, name: str, value) -> None:
        """Last-value metric (e.g. domain size) — NOT accumulated."""
        with self._lock:
            self.gauges[name] = value

    # -- emission ------------------------------------------------------------

    def _emit(self, rec: _PhaseRecord, counter_delta: dict, gauges: dict) -> None:
        # rec is the finished call's private subtree — no lock needed.
        line = {
            "event": "phase",
            "name": rec.name,
            **rec.as_dict(),
        }
        if counter_delta:
            line["counters"] = counter_delta
        if gauges:
            line["gauges"] = gauges
        print(json.dumps(line), file=sys.stderr, flush=True)

    def snapshot(self) -> dict:
        """Full process-lifetime metrics tree + counters (tests/bench)."""
        with self._lock:
            return {
                "phases": {k: v.as_dict() for k, v in self.root.children.items()},
                "counters": dict(self.counters),
                "gauges": dict(self.gauges),
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


def gauge(name: str, value) -> None:
    _GLOBAL.gauge(name, value)


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

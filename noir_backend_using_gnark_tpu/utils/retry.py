"""Transient-failure recovery for long device operations.

SURVEY.md §5 "failure detection/recovery": the reference's failure
model is process-fatal (gnark_backend_ffi/main.go:29 ``log.Fatal`` on
any error); ours is catchable exceptions (errors.py) — but *catchable*
is only half the story for multi-minute proves. On TPU hosts the
retryable failure class is infrastructure, not math: the XLA compile
path can round-trip a remote service whose connection drops (round 3
lost a 2^24 MSM benchmark to exactly this), and a transient
``RESOURCE_EXHAUSTED`` can clear once in-flight buffers drain.

:func:`retry_transient` wraps such a dispatch: genuine errors
(``ProvingError``, bad inputs, real OOM loops) propagate immediately;
errors matching the known-transient signatures are retried after a
pause, with a ``retry.<label>`` metrics counter so recoveries are
visible in the phase JSON rather than silent. Proving is deterministic
given the seed (plonk/prove.py), so a retried phase reproduces the
same proof bytes — retry is always semantically safe here.
"""

from __future__ import annotations

import re
import time

from . import metrics

#: Anchored patterns identifying infrastructure errors that historically
#: recovered on retry (compile-relay transport cuts, service hiccups).
#: Word-boundary anchors keep incidental matches out: a message that
#: merely contains "element 5023" or an EOFError raised by a local pipe
#: must NOT trigger a useless 10 s retry pause.
TRANSIENT_PATTERNS = tuple(
    re.compile(p)
    for p in (
        r"remote_compile",
        r"\bread body\b",
        r"(?i)\bconnection reset\b",
        r"\bunexpected EOF\b",
        r"\bEOF while\b",
        r"\bHTTP(?:/\d\.\d)?\"? (?:status )?50[23]\b",
        r"(?i)\b50[23] (?:bad gateway|service unavailable)\b",
        r"\bUNAVAILABLE\b",
        r"\bDEADLINE_EXCEEDED\b",
    )
)


def is_transient(e: BaseException) -> bool:
    """Heuristic: does this exception look like a recoverable
    infrastructure failure (vs a real program/math error)?

    Matches anchored signatures against the rendered exception; the
    exception *type* name is included so typed transport errors (e.g.
    ``XlaRuntimeError: UNAVAILABLE ...``) classify without string
    spelunking, but plain ``EOFError``/``OSError`` from local IO do
    not match any pattern and propagate immediately.
    """
    s = f"{type(e).__name__}: {e}"
    return any(p.search(s) for p in TRANSIENT_PATTERNS)


#: Backwards-compatible alias (tests/bench referenced the tuple name).
TRANSIENT_SIGNATURES = tuple(p.pattern for p in TRANSIENT_PATTERNS)


def retry_transient(fn, label: str, tries: int = 2, pause_s: float = 10.0):
    """Run ``fn()``; on a transient-looking error retry up to ``tries``
    total attempts, pausing ``pause_s`` between (the compile relay's
    queue is serial — give it breathing room). Non-transient errors
    propagate immediately; the final transient error propagates too.
    """
    for attempt in range(tries):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — classified below
            if attempt + 1 < tries and is_transient(e):
                metrics.count(f"retry.{label}")
                time.sleep(pause_s)
                continue
            raise
    raise AssertionError("unreachable")

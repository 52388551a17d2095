"""Bounded retry + stall watchdog for relay-fragile device operations.

The tunneled TPU (axon relay) has two observed failure modes that are
transient, not programmatic (EPISODE_r04 ledger, CLAUDE.md):

- a first-contact hang: backend init stalls a single dispatch for 10-15+
  minutes before eventually completing (949.5 s charged to mapper/first_frame
  in the r04 warm run);
- a transient ``FAILED_PRECONDITION: TPU backend error`` raised on the first
  value fetch of a freshly compiled program; an immediate re-dispatch
  succeeds.

``with_retry`` wraps an IDEMPOTENT device closure (dispatch + fetch of a
pure function — re-running it recomputes the same values) in a bounded
retry that fires only on transient-looking runtime errors, and arms a
watchdog that prints a loud once-per-threshold warning when the call stalls,
so a hang is at least attributed in the log in real time instead of being
discovered post-mortem in a stage max. Python cannot interrupt a stuck XLA
call, so the watchdog observes; the retry handles the raising failure mode.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, TypeVar

T = TypeVar("T")

# substrings of transient relay/backend errors worth a re-dispatch; anything
# else (shape errors, OOM, tracer leaks) is programmatic and must propagate
TRANSIENT_MARKERS = (
    "FAILED_PRECONDITION",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "ABORTED",
    "TPU backend error",
    "connection reset",
    "socket closed",
    # relay HTTP transport failures (observed killing a 1000-step episode at
    # a densify_phase compile: "INTERNAL: http://127.0.0.1:8083/remote_compile:
    # read body: response body closed before all bytes were read")
    "remote_compile",
    "response body closed",
    "read body",
    "broken pipe",
)


def is_transient(exc: BaseException) -> bool:
    """True iff the exception looks like a transient relay/backend failure."""
    if type(exc).__name__ not in ("XlaRuntimeError", "JaxRuntimeError", "RuntimeError", "OSError"):
        return False
    msg = str(exc)
    return any(m.lower() in msg.lower() for m in TRANSIENT_MARKERS)


def with_retry(
    fn: Callable[[], T],
    *,
    attempts: int = 3,
    base_delay_s: float = 2.0,
    desc: str = "device op",
    stall_warn_s: float = 120.0,
    _sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Run an idempotent device closure with bounded transient-error retry.

    Retries only when ``is_transient`` accepts the error; delay doubles per
    attempt. While the closure runs, a daemon timer prints a warning every
    ``stall_warn_s`` seconds so relay hangs surface in the live log."""
    last: BaseException | None = None
    for attempt in range(attempts):
        done = threading.Event()
        t0 = time.time()

        def _watch() -> None:
            while not done.wait(stall_warn_s):
                print(
                    f"WARNING: {desc} stalled {time.time() - t0:.0f}s "
                    "(relay hang? cannot be interrupted — waiting)",
                    flush=True,
                )

        watchdog = threading.Thread(target=_watch, daemon=True)
        watchdog.start()
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — filtered by is_transient
            if not is_transient(exc) or attempt == attempts - 1:
                raise
            last = exc
            print(
                f"WARNING: {desc} failed transiently "
                f"({type(exc).__name__}: {str(exc)[:200]}) — "
                f"retry {attempt + 1}/{attempts - 1}",
                flush=True,
            )
            _sleep(base_delay_s * (2**attempt))
        finally:
            done.set()
    raise last  # pragma: no cover — loop always returns or raises

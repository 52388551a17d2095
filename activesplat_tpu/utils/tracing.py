"""Stage tracing / profiling taxonomy.

The reference wraps every pipeline stage in CUDA-event timers
(`start_timing`/`end_timing`, reference src/utils/__init__.py:33-57) and
accumulates per-stage wall-clock sums reported at shutdown
(splatam/__init__.py:124-131,545-552). The TPU equivalents here:

- `stage(name)` — context manager that (a) tags the region with
  `jax.profiler.TraceAnnotation`, so the stage taxonomy shows up in captured
  XLA/TPU profiles, and (b) accumulates host wall-clock per stage name.
  Nested stages compose (annotations nest; timings accumulate per name).
- `stage_report()` / `format_stage_report()` — the per-stage sums/counts,
  printed by `SplaTAMMapper.post_processing` alongside the reference's
  Average Mapping Iteration/Frame lines.
- `trace_capture(logdir)` — one-shot `jax.profiler.trace` wrapper; set
  `ACTIVESPLAT_TRACE_DIR` to capture a device profile of an episode without
  code changes (`runtime/launch.py` consults it).

Timing on the tunneled TPU requires a value fetch to synchronize; stage
timings here deliberately measure *dispatch* wall-clock (like the
reference's un-synced host timers between events) — device-accurate numbers
come from the captured profiler trace, not these sums.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from typing import Dict, Iterator, Optional, Tuple

import jax

_lock = threading.Lock()
_sums: Dict[str, float] = {}
_counts: Dict[str, int] = {}
_maxes: Dict[str, float] = {}


@contextlib.contextmanager
def stage(name: str) -> Iterator[None]:
    """Time a named pipeline stage and tag it for the device profiler."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    with _lock:
        _sums[name] = _sums.get(name, 0.0) + dt
        _counts[name] = _counts.get(name, 0) + 1
        if dt > _maxes.get(name, 0.0):
            _maxes[name] = dt


def stage_report() -> Dict[str, Tuple[float, int]]:
    """{stage: (total_seconds, calls)} accumulated so far."""
    with _lock:
        return {k: (_sums[k], _counts[k]) for k in _sums}


def stage_report_full() -> Dict[str, Tuple[float, int, float]]:
    """{stage: (total_seconds, calls, max_call_seconds)}.

    The max makes one-off relay hangs visible: the tunneled TPU
    intermittently stalls a single dispatch for minutes (CLAUDE.md), which
    otherwise silently inflates a stage sum — a stage whose max is tens of
    times its mean was hit by a hang, not by steady-state cost."""
    with _lock:
        return {k: (_sums[k], _counts[k], _maxes[k]) for k in _sums}


def reset_stages() -> None:
    with _lock:
        _sums.clear()
        _counts.clear()
        _maxes.clear()


def format_stage_report() -> str:
    rows = sorted(stage_report().items(), key=lambda kv: -kv[1][0])
    if not rows:
        return "no stages recorded"
    width = max(len(k) for k, _ in rows)
    lines = [
        f"{k:<{width}}  {tot:8.3f} s  /{cnt:6d} calls  "
        f"= {tot / cnt * 1000:8.2f} ms/call"
        for k, (tot, cnt) in rows
    ]
    return "\n".join(lines)


@contextlib.contextmanager
def trace_capture(logdir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace into `logdir` (or ACTIVESPLAT_TRACE_DIR).

    No-op when neither is set, so call sites can wrap unconditionally."""
    logdir = logdir or os.environ.get("ACTIVESPLAT_TRACE_DIR")
    if not logdir:
        yield
        return
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        yield

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
import functools
import os
import threading
import time
from typing import Dict, Iterator, Optional, Tuple

import jax

_lock = threading.Lock()
_sums: Dict[str, float] = {}
_counts: Dict[str, int] = {}
_maxes: Dict[str, float] = {}

# Per-stage device-IO counters (VERDICT r4 item 6: decompose per-event wall
# clock MECHANICALLY — a 148 ms mapping event at a ~1 ms/roundtrip relay is
# explained by its dispatch/fetch count, not by device FLOPs). Four counters
# per stage name:
#   jit   — calls into counted jitted entry points (see counted_jit)
#   eager — eager-op dispatches (jnp ops OUTSIDE jit; each is a relay
#           roundtrip through the tunneled TPU — the silent killers)
#   fetch — device->host value fetches (np.asarray / float() of jax arrays)
#   fetch_bytes — bytes moved by those fetches (the relay is ~10 MB/s)
_tls = threading.local()
_io: Dict[str, Dict[str, int]] = {}
_IO_KEYS = ("jit", "eager", "fetch", "fetch_bytes")


def _cur_stage() -> Optional[str]:
    stk = getattr(_tls, "stack", None)
    return stk[-1] if stk else None


def _note_io(key: str, inc: int = 1) -> None:
    name = _cur_stage()
    if name is None:
        name = "(no stage)"
    with _lock:
        d = _io.get(name)
        if d is None:
            d = _io[name] = dict.fromkeys(_IO_KEYS, 0)
        d[key] += inc


@contextlib.contextmanager
def stage(name: str) -> Iterator[None]:
    """Time a named pipeline stage and tag it for the device profiler."""
    stk = getattr(_tls, "stack", None)
    if stk is None:
        stk = _tls.stack = []
    stk.append(name)
    t0 = time.perf_counter()
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        dt = time.perf_counter() - t0
        stk.pop()
        with _lock:
            _sums[name] = _sums.get(name, 0.0) + dt
            _counts[name] = _counts.get(name, 0) + 1
            if dt > _maxes.get(name, 0.0):
                _maxes[name] = dt


class _CountedJit:
    """Thin shim around a jitted callable that counts each dispatch against
    the active stage. Attribute access (lower, trace, …) passes through."""

    def __init__(self, fn):
        self._fn = fn
        functools.update_wrapper(self, fn, updated=())

    def __call__(self, *args, **kwargs):
        _note_io("jit")
        return self._fn(*args, **kwargs)

    def __getattr__(self, name):
        return getattr(self._fn, name)


def counted_jit(fn):
    """Wrap a jitted entry point so dispatches land in the IO counters."""
    return _CountedJit(fn)


def fetch(x):
    """np.asarray(x), counted against the active stage as one device->host
    fetch of `nbytes`. The explicit helper is the reliable chokepoint:
    ArrayImpl is a C++ nanobind type, so numpy's __array__ lookup cannot be
    monkeypatched from Python. Hot-loop call sites (mapper, queries) fetch
    through this."""
    import numpy as np

    a = np.asarray(x)
    _note_io("fetch")
    _note_io("fetch_bytes", int(a.nbytes))
    return a


_io_installed = False


def install_io_counters() -> None:
    """Patch the eager-dispatch chokepoint (idempotent):

    core.EvalTrace.process_primitive is the one Python entry every EAGER op
    bind passes through (each primitive's .impl is a partial captured at
    definition time, so patching dispatch.apply_primitive misses them; jit
    fast paths bypass Python entirely and are counted via counted_jit;
    fetches are counted by the explicit fetch() helper).

    Overhead is one dict update per event — noise next to the ~1 ms the
    relay charges for the roundtrip itself."""
    global _io_installed
    if _io_installed:
        return
    _io_installed = True

    from jax._src import core as _jcore

    orig_process = _jcore.EvalTrace.process_primitive

    @functools.wraps(orig_process)
    def counted_process(self, primitive, args, params):
        _note_io("eager")
        return orig_process(self, primitive, args, params)

    _jcore.EvalTrace.process_primitive = counted_process


def stage_report_io() -> Dict[str, Dict[str, int]]:
    """{stage: {jit, eager, fetch, fetch_bytes}} accumulated so far."""
    with _lock:
        return {k: dict(v) for k, v in _io.items()}


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
        _io.clear()


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

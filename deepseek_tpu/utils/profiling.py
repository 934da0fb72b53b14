"""Tracing / profiling utilities.

Parity with the reference's three mechanisms (SURVEY.md §5):
1. Scoped wall-clock profiler keyed by the dotted nesting path
   (profile.h:24-55): ``with profile_scope("model.attn"): ...``; aggregated
   into a global map, dumpable like main.cpp:355-360. Enabled by the
   DSEEK_PROFILE env var or ``enable_profiling()``; warmup excluded via
   ``profiling_disabled()``.
2. ``device_trace(logdir)``: jax.profiler trace context (the gprof/XLA
   analogue; view in TensorBoard or xprof).
3. The analytical bandwidth model lives in
   deepseek_tpu.models.loader.params_active_bytes (active_bytes parity).
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from collections import defaultdict
from typing import Dict, Iterator

_enabled = os.environ.get("DSEEK_PROFILE", "0") == "1"
_disabled_depth = 0
_times: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)
_stack = threading.local()
_lock = threading.Lock()


def enable_profiling(on: bool = True) -> None:
    global _enabled
    _enabled = on


def profiling_enabled() -> bool:
    return _enabled and _disabled_depth == 0


@contextlib.contextmanager
def profiling_disabled() -> Iterator[None]:
    """Exclude a region (e.g. warmup) from profiling (ProfileDisabledScope)."""
    global _disabled_depth
    _disabled_depth += 1
    try:
        yield
    finally:
        _disabled_depth -= 1


@contextlib.contextmanager
def profile_scope(name: str) -> Iterator[None]:
    if not profiling_enabled():
        yield
        return
    stack = getattr(_stack, "names", None)
    if stack is None:
        stack = _stack.names = []
    stack.append(name)
    key = ".".join(stack)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        stack.pop()
        with _lock:
            _times[key] += dt
            _counts[key] += 1


def profile_report() -> Dict[str, float]:
    with _lock:
        return dict(sorted(_times.items()))


def reset_profile() -> None:
    with _lock:
        _times.clear()
        _counts.clear()


def dump_profile() -> str:
    """Formatted like the reference's end-of-run dump (main.cpp:355-360)."""
    lines = ["Profile total times (sec):"]
    with _lock:
        for k in sorted(_times):
            lines.append(f"  {k}: {_times[k]:.4f} ({_counts[k]} calls)")
    return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """XLA/TPU device trace via jax.profiler (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

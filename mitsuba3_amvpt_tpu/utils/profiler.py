"""Phase profiler — TPU equivalent of the reference's ProfilerPhase /
ScopedPhase machinery (include/mitsuba/core/profiler.h:20-49,88; ITT and
NVTX range annotations become ``jax.profiler`` trace annotations).

Two layers:

* ``ScopedPhase(name)`` — RAII-style context manager.  Inside a traced
  region it emits a ``jax.named_scope`` (visible in jaxprs/HLO and in
  xprof timelines); at the host level it accumulates wall-clock totals
  per phase, like the reference's phase timer report
  (mvpath.cpp:249-270 "Computation graph recorded / Code generation
  finished" messages).
* ``trace(logdir)`` — wraps ``jax.profiler.trace`` for full xprof device
  captures (the analog of running the reference under nsys/vtune).

The standard phase names mirror profiler.h's enum where meaningful
(LoadScene, InitAccel, Render*, SamplingIntegratorSample, RayIntersect,
BSDFEvaluate/Sample, ImageBlockPut, ...).
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict

import jax

_lock = threading.Lock()
_totals = defaultdict(float)      # phase -> accumulated seconds
_counts = defaultdict(int)
_enabled = True


def set_enabled(flag: bool):
    """Globally enable/disable host-side phase timing (the named_scope
    annotation is free and always emitted)."""
    global _enabled
    _enabled = bool(flag)


@contextlib.contextmanager
def ScopedPhase(name: str):
    """Annotate a phase (profiler.h:88 ScopedPhase).

    Emits a jax.named_scope so traced computation shows up under `name`
    in jaxprs/HLO/xprof, and accumulates host wall-clock when enabled.
    NOTE: host timing around *traced* code measures trace/compile/
    dispatch time, not device time — use ``trace()`` for device
    timelines.  This mirrors the reference, whose scoped phases also
    measure the recording thread.
    """
    t0 = time.perf_counter() if _enabled else 0.0
    with jax.named_scope(name.replace(" ", "_")):
        yield
    if _enabled:
        dt = time.perf_counter() - t0
        with _lock:
            _totals[name] += dt
            _counts[name] += 1


def report() -> dict:
    """Phase -> (seconds, count) accumulated so far."""
    with _lock:
        return {k: (v, _counts[k]) for k, v in sorted(_totals.items())}


def reset():
    with _lock:
        _totals.clear()
        _counts.clear()


def report_string() -> str:
    """Human-readable table (the reference prints one at shutdown when
    profiling is enabled)."""
    rows = report()
    if not rows:
        return "(no profiled phases)"
    w = max(len(k) for k in rows)
    lines = [f"{'Phase':<{w}}  {'Total':>9}  {'Count':>6}  {'Mean':>9}"]
    for k, (sec, cnt) in rows.items():
        lines.append(f"{k:<{w}}  {sec:>8.3f}s  {cnt:>6d}  "
                     f"{sec / max(cnt, 1):>8.4f}s")
    return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable with xprof/tensorboard
    (``jax.profiler.trace`` wrapper)."""
    with jax.profiler.trace(logdir):
        yield


def annotate_step(name: str, step: int):
    """StepTraceAnnotation for training loops (one xprof step marker per
    optimizer iteration)."""
    return jax.profiler.StepTraceAnnotation(name, step_num=step)

"""Logging + progress reporting — equivalents of the reference's Logger/
Appender/Formatter chain (src/core/logger.cpp, appender.cpp,
formatter.cpp) and ProgressReporter (src/core/progress.cpp).

The reference's custom object hierarchy collapses onto Python's stdlib
``logging`` with a Mitsuba-style formatter; ``ProgressReporter`` keeps
the reference's terminal bar + ETA behavior (progress.cpp) without a
tqdm dependency.
"""

from __future__ import annotations

import logging as _pylog
import shutil
import sys
import time

# Mitsuba log levels (logger.h): Trace(0) Debug(100) Info(200) Warn(300)
# Error(400) map onto the stdlib scale.
Trace = 5
Debug = _pylog.DEBUG
Info = _pylog.INFO
Warn = _pylog.WARNING
Error = _pylog.ERROR

_pylog.addLevelName(Trace, "TRACE")

_logger = _pylog.getLogger("mitsuba3_amvpt_tpu")


class _MitsubaFormatter(_pylog.Formatter):
    """'2023-01-01 12:00:00 INFO  main  [file:line] message' — the
    DefaultFormatter layout (src/core/formatter.cpp)."""

    def format(self, record):
        ts = time.strftime("%Y-%m-%d %H:%M:%S",
                           time.localtime(record.created))
        return (f"{ts} {record.levelname:<5} [{record.module}:"
                f"{record.lineno}] {record.getMessage()}")


def _ensure_handler():
    if not _logger.handlers:
        h = _pylog.StreamHandler(sys.stderr)
        h.setFormatter(_MitsubaFormatter())
        _logger.addHandler(h)
        _logger.setLevel(Info)
        _logger.propagate = False


def set_log_level(level):
    """logger.h ``set_log_level``."""
    _ensure_handler()
    _logger.setLevel(level)


def log(level, msg, *args):
    """The reference's ``Log(Level, ...)`` macro."""
    _ensure_handler()
    _logger.log(level, msg, *args)


def logger() -> _pylog.Logger:
    _ensure_handler()
    return _logger


class ProgressReporter:
    """Terminal progress bar with ETA (src/core/progress.cpp).

    >>> p = ProgressReporter("Rendering", total=64)
    >>> for i in range(64): p.update(i + 1)
    >>> p.finish()
    """

    def __init__(self, label: str, total: int = 1, stream=None,
                 min_interval: float = 0.2):
        self.label = label
        self.total = max(int(total), 1)
        self.stream = stream if stream is not None else sys.stderr
        self.t0 = time.time()
        self.min_interval = min_interval
        self._last_draw = 0.0
        self._done = False

    def update(self, value: int):
        now = time.time()
        if value < self.total and now - self._last_draw < self.min_interval:
            return
        self._last_draw = now
        frac = min(value / self.total, 1.0)
        elapsed = now - self.t0
        eta = elapsed * (1.0 - frac) / max(frac, 1e-9)
        cols = shutil.get_terminal_size((80, 20)).columns
        bar_w = max(cols - len(self.label) - 30, 8)
        filled = int(bar_w * frac)
        bar = "=" * filled + (">" if filled < bar_w else "") \
            + " " * max(bar_w - filled - 1, 0)
        self.stream.write(
            f"\r{self.label} [{bar}] {100*frac:5.1f}% "
            f"(ETA {eta:6.1f}s)")
        self.stream.flush()

    def finish(self):
        if self._done:
            return
        self._done = True
        elapsed = time.time() - self.t0
        self.stream.write(f"\r{self.label} done. ({elapsed:.2f}s)"
                          + " " * 30 + "\n")
        self.stream.flush()

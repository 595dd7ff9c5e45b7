"""Logging, statistics counters, progress reporting.

Capability parity with reference libcore observability:
  * Logger/Appender/Formatter (logger.h:94, appender.h, formatter.h) —
    leveled logging with pluggable appenders and the reference's
    class+context line format;
  * StatsCounter/Statistics (statistics.h:47-80,262) — named counters with
    printStats(); the reference pads per-core slots against false sharing,
    which has no analog here (host-side counters; device-side metrics come
    back in the integrators' aux dicts);
  * ProgressReporter (statistics.h:214) — console progress bars.
"""
from __future__ import annotations

import sys
import time
from collections import defaultdict
from enum import IntEnum
from typing import Callable, List


class LogLevel(IntEnum):
    TRACE = 0
    DEBUG = 100
    INFO = 200
    WARN = 300
    ERROR = 400


class Logger:
    """Leveled logger with appenders (reference Logger, logger.h:94)."""

    def __init__(self, level: LogLevel = LogLevel.INFO):
        self.level = level
        self.appenders: List[Callable[[LogLevel, str], None]] = [
            lambda lv, msg: print(msg, file=sys.stderr)
        ]

    def add_appender(self, fn):
        self.appenders.append(fn)

    def clear_appenders(self):
        self.appenders = []

    def log(self, level: LogLevel, fmt: str, *args, cls: str | None = None):
        if level < self.level:
            return
        msg = fmt % args if args else fmt
        prefix = f"{time.strftime('%H:%M:%S')} {level.name:5s} "
        if cls:
            prefix += f"[{cls}] "
        for ap in self.appenders:
            ap(level, prefix + msg)

    def trace(self, fmt, *a, **kw):
        self.log(LogLevel.TRACE, fmt, *a, **kw)

    def debug(self, fmt, *a, **kw):
        self.log(LogLevel.DEBUG, fmt, *a, **kw)

    def info(self, fmt, *a, **kw):
        self.log(LogLevel.INFO, fmt, *a, **kw)

    def warn(self, fmt, *a, **kw):
        self.log(LogLevel.WARN, fmt, *a, **kw)

    def error(self, fmt, *a, **kw):
        self.log(LogLevel.ERROR, fmt, *a, **kw)


_default_logger = Logger()


def get_logger() -> Logger:
    return _default_logger


class Statistics:
    """Global named counters (reference StatsCounter/Statistics)."""

    def __init__(self):
        self._counters = defaultdict(float)
        self._bases = defaultdict(float)

    def increment(self, category: str, name: str, value: float = 1.0,
                  base: float = 0.0):
        key = (category, name)
        self._counters[key] += value
        self._bases[key] += base

    def value(self, category: str, name: str) -> float:
        return self._counters[(category, name)]

    def print_stats(self, file=sys.stderr):
        """Reference Statistics::printStats output shape."""
        by_cat = defaultdict(list)
        for (cat, name), v in sorted(self._counters.items()):
            base = self._bases[(cat, name)]
            if base > 0:
                by_cat[cat].append(f"  {name}: {v / base:.4g} (avg over {base:.0f})")
            else:
                by_cat[cat].append(f"  {name}: {v:.6g}")
        print("Statistics:", file=file)
        for cat, lines in by_cat.items():
            print(f" * {cat}:", file=file)
            for ln in lines:
                print(ln, file=file)

    def reset(self):
        self._counters.clear()
        self._bases.clear()


_stats = Statistics()


def get_statistics() -> Statistics:
    return _stats


class ProgressReporter:
    """Console progress bar (reference ProgressReporter, statistics.h:214)."""

    def __init__(self, title: str, total: float, width: int = 40,
                 stream=sys.stderr, min_interval: float = 0.25):
        self.title = title
        self.total = max(total, 1e-9)
        self.width = width
        self.stream = stream
        self.start = time.time()
        self._last = 0.0
        self.min_interval = min_interval

    def update(self, value: float):
        now = time.time()
        if now - self._last < self.min_interval and value < self.total:
            return
        self._last = now
        frac = min(value / self.total, 1.0)
        filled = int(frac * self.width)
        bar = "+" * filled + "-" * (self.width - filled)
        elapsed = now - self.start
        eta = elapsed / max(frac, 1e-9) * (1 - frac)
        self.stream.write(
            f"\r{self.title}: [{bar}] {frac*100:5.1f}% "
            f"({elapsed:.1f}s, ETA {eta:.1f}s)"
        )
        if frac >= 1.0:
            self.stream.write("\n")
        self.stream.flush()

    def finish(self):
        self.update(self.total)

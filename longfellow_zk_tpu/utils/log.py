"""Leveled logging (reference lib/util/log.{h,cc}: ERROR/WARNING/INFO,
global level, printf-style phase logs)."""

from __future__ import annotations

import sys
import time

ERROR = 0
WARNING = 1
INFO = 2

_level = WARNING
_t0 = time.time()


def set_log_level(level: int) -> None:
    global _level
    _level = level


def log(level: int, fmt: str, *args) -> None:
    if level <= _level:
        name = {ERROR: "E", WARNING: "W", INFO: "I"}[level]
        msg = fmt % args if args else fmt
        print("[%s +%7.2fs] %s" % (name, time.time() - _t0, msg),
              file=sys.stderr, flush=True)

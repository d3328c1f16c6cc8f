"""Leveled logger with the reference's console conventions.

The reference logs with printf prefixes `[+] [W] [E] [I] [D]`
(keyhunt.cpp throughout) plus a `-q` quiet flag and `-M` matrix mode
(newline-per-update instead of \\r rewrites); the scaffolding layer has a
singleton Logger with console/file sinks and levels
(include/keyhunt/core/logger.h:31-385). This module provides both:
the same visible prefixes, a real level filter, and optional file sinks.
"""

from __future__ import annotations

import sys
import threading
from typing import IO, List, Optional

LEVELS = {"debug": 10, "info": 20, "plus": 25, "warn": 30, "error": 40, "quiet": 100}
_PREFIX = {"debug": "[D]", "info": "[I]", "plus": "[+]", "warn": "[W]", "error": "[E]"}


class Logger:
    def __init__(self, name: str = "keyhunt", level: str = "plus"):
        self.name = name
        self.level = LEVELS[level]
        self.matrix = False  # -M: never rewrite lines
        self._sinks: List[IO] = [sys.stderr]
        self._lock = threading.Lock()
        self._last_transient = False

    def add_file_sink(self, path: str) -> None:
        self._sinks.append(open(path, "a"))

    def set_level(self, level: str) -> None:
        self.level = LEVELS[level]

    def _emit(self, level: str, msg: str, transient: bool = False) -> None:
        if LEVELS[level] < self.level:
            return
        with self._lock:
            for sink in self._sinks:
                is_tty = sink is sys.stderr and sink.isatty() and not self.matrix
                if transient and is_tty:
                    sink.write(f"\r{_PREFIX[level]} {msg}\x1b[K")
                    self._last_transient = True
                else:
                    if self._last_transient and is_tty:
                        sink.write("\n")
                    sink.write(f"{_PREFIX[level]} {msg}\n")
                    self._last_transient = False
                sink.flush()

    def debug(self, msg: str) -> None:
        self._emit("debug", msg)

    def info(self, msg: str) -> None:
        self._emit("info", msg)

    def plus(self, msg: str) -> None:
        self._emit("plus", msg)

    def warn(self, msg: str) -> None:
        self._emit("warn", msg)

    def error(self, msg: str) -> None:
        self._emit("error", msg)

    def status(self, msg: str) -> None:
        """Rewriting progress line (the reference's \\r stats tick,
        keyhunt.cpp:2201-2237); becomes a normal line under matrix mode."""
        self._emit("plus", msg, transient=True)

    def result(self, msg: str) -> None:
        """Always-visible outcome line (found keys) — bypasses -q the way
        the reference always prints hits regardless of quiet mode."""
        level = self.level
        self.level = 0
        try:
            self._emit("plus", msg)
        finally:
            self.level = level


_logger: Optional[Logger] = None


def get_logger() -> Logger:
    global _logger
    if _logger is None:
        _logger = Logger()
    return _logger


def set_level(level: str) -> None:
    get_logger().set_level(level)

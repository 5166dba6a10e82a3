"""Logging setup — parity with fs_mol/utils/logging.py:10-112.

Console + file handlers via dictConfig, a custom PROGRESS level (15)
between DEBUG and INFO, context-managed per-task message prefixes, a
temporary console-level restriction context, and a file-like adapter so
third-party code that wants a stream can write into a logger.
"""

from __future__ import annotations

import logging
import logging.config
from contextlib import contextmanager
from typing import Iterator, Optional

PROGRESS_LOG_LEVEL = 15

_prefix_stack: list = []


def _progress(self, message, *args, **kwargs):
    if self.isEnabledFor(PROGRESS_LOG_LEVEL):
        self._log(PROGRESS_LOG_LEVEL, message, args, **kwargs)


def set_up_logging(log_file: Optional[str] = None, level: int = PROGRESS_LOG_LEVEL) -> None:
    """Install console (+ optional file) handlers on the root logger."""
    logging.addLevelName(PROGRESS_LOG_LEVEL, "PROGRESS")
    logging.Logger.progress = _progress  # type: ignore[attr-defined]

    handlers = {
        "console": {
            "class": "logging.StreamHandler",
            "formatter": "simple",
            "level": level,
        }
    }
    if log_file is not None:
        handlers["file"] = {
            "class": "logging.FileHandler",
            "formatter": "detailed",
            "filename": log_file,
            "level": logging.DEBUG,
        }
    logging.config.dictConfig(
        {
            "version": 1,
            "disable_existing_loggers": False,
            "formatters": {
                "simple": {"format": "%(asctime)s %(levelname)s %(message)s"},
                "detailed": {
                    "format": "%(asctime)s %(name)s %(levelname)s %(message)s"
                },
            },
            "handlers": handlers,
            "root": {"level": "DEBUG", "handlers": list(handlers)},
        }
    )
    # Apply any prefix that was active before reconfiguration.
    _install_prefix_filter()


class _PrefixFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        if _prefix_stack:
            record.msg = "".join(_prefix_stack) + str(record.msg)
        return True


_filter = _PrefixFilter()


def _install_prefix_filter() -> None:
    root = logging.getLogger()
    for h in root.handlers:
        if _filter not in h.filters:
            h.addFilter(_filter)


@contextmanager
def prefix_log_msgs(prefix: str) -> Iterator[None]:
    """Prefix all log messages within the context (reference per-task
    prefixes during eval, fs_mol/utils/logging.py)."""
    _install_prefix_filter()
    _prefix_stack.append(prefix)
    try:
        yield
    finally:
        _prefix_stack.pop()


@contextmanager
def restrict_console_log_level(level: int) -> Iterator[None]:
    """Temporarily raise the console handler's threshold."""
    root = logging.getLogger()
    consoles = [
        h
        for h in root.handlers
        if isinstance(h, logging.StreamHandler) and not isinstance(h, logging.FileHandler)
    ]
    old = [h.level for h in consoles]
    for h in consoles:
        h.setLevel(max(h.level, level))
    try:
        yield
    finally:
        for h, lvl in zip(consoles, old):
            h.setLevel(lvl)


class FileLikeLogger:
    """File-object facade over a logger (for APIs that demand a stream)."""

    def __init__(self, logger: logging.Logger, level: int = logging.INFO):
        self.logger = logger
        self.level = level
        self._buf = ""

    def write(self, text: str) -> int:
        self._buf += text
        while "\n" in self._buf:
            line, self._buf = self._buf.split("\n", 1)
            if line:
                self.logger.log(self.level, line)
        return len(text)

    def flush(self) -> None:
        if self._buf:
            self.logger.log(self.level, self._buf)
            self._buf = ""

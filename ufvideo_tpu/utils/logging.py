"""Logging + profiling utilities.

- ``build_logger``: stdout/stderr capture into a daily-rotating file
  (reference: ufvideo/utils.py:17-57), kept API-compatible.
- ``profile_trace``: jax.profiler trace context — the TPU-native tracing the
  reference lacks entirely (SURVEY §5 "Tracing/profiling: absent").
- ``rank0_print``: reference train.py:55-57.
"""

from __future__ import annotations

import contextlib
import logging
import logging.handlers
import os
import sys
from typing import Optional

_handler: Optional[logging.Handler] = None


class StreamToLogger:
    """File-like that forwards writes to a logger (utils.py:60-90)."""

    def __init__(self, logger: logging.Logger, level: int = logging.INFO):
        self.logger = logger
        self.level = level
        self._buf = ""

    def __getattr__(self, attr):
        return getattr(sys.__stdout__, attr)

    def write(self, buf: str) -> None:
        self._buf += buf
        while "\n" in self._buf:
            line, self._buf = self._buf.split("\n", 1)
            if line:
                self.logger.log(self.level, line)

    def flush(self) -> None:
        if self._buf:
            self.logger.log(self.level, self._buf)
            self._buf = ""


def build_logger(
    logger_name: str, logger_filename: str, log_dir: str = "."
) -> logging.Logger:
    global _handler
    formatter = logging.Formatter(
        fmt="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    logging.basicConfig(level=logging.INFO, format=formatter._fmt)

    if _handler is None:
        os.makedirs(log_dir, exist_ok=True)
        _handler = logging.handlers.TimedRotatingFileHandler(
            os.path.join(log_dir, logger_filename),
            when="D", utc=True, encoding="utf-8",
        )
        _handler.setFormatter(formatter)
        for name, item in logging.root.manager.loggerDict.items():
            if isinstance(item, logging.Logger):
                item.addHandler(_handler)

    logger = logging.getLogger(logger_name)
    logger.setLevel(logging.INFO)
    logger.addHandler(_handler)
    return logger


def rank0_print(*args) -> None:
    try:
        import jax

        if jax.process_index() != 0:
            return
    except Exception:
        pass
    print(*args)


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace scope; view with tensorboard/xprof."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

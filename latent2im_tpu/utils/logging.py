"""Structured logging: timestamped file + stdout, uncaught-exception capture.

Same observability surface as the reference's utils/logging.py:92-139
(configure(file) -> log.txt + console with multiline timestamped formatting,
sys.excepthook routed into the log), plus a jax.profiler trace helper — the
reference has no tracing at all (SURVEY §5.1); on TPU this is first-class.
"""

from __future__ import annotations

import contextlib
import logging
import sys


class MultilineFormatter(logging.Formatter):
    """Prefix every line of a multiline message with the timestamp header."""

    def format(self, record):
        header = self.formatTime(record, self.datefmt)
        msg = record.getMessage()
        return "\n".join(f"{header} {line}" for line in msg.split("\n"))


def configure(filename: str, append: bool = False) -> None:
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    for h in list(root.handlers):
        root.removeHandler(h)
    fmt = MultilineFormatter(datefmt="%Y-%m-%d %H:%M:%S")
    fh = logging.FileHandler(filename, mode="a" if append else "w")
    fh.setFormatter(fmt)
    root.addHandler(fh)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    root.addHandler(sh)

    def excepthook(exc_type, exc_value, tb):
        logging.exception("uncaught exception", exc_info=(exc_type, exc_value, tb))

    sys.excepthook = excepthook


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace around a region; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

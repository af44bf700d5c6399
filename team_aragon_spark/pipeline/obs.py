"""Observability parity: load timing (O2) + rotating-file logging (O3).

Reference behavior being matched (SURVEY.md §2.I):

- O2 — ``load_hhs.py:65,149-150``: wall-clock the batch load
  (``start_time = time.time()`` ... ``print(end_time - start_time)``).
  Here the elapsed seconds ride on the LoadReport (``wall_s``) and are
  logged, instead of a bare print.
- O3 — ``logging_module.py:5-15``: root logger at DEBUG plus a
  ``RotatingFileHandler`` writing ``log_output.txt`` with the
  ``'%(asctime)s - %(levelname)s - %(message)s'`` format.  Ported
  as-is but parameterized (path, level) and idempotent — calling it
  twice must not stack duplicate handlers (a bug class the reference
  avoids only by being a one-shot script).

Driver-side only: these observe the *job*, not the data; nothing here
touches an executor, so it is scale-independent by construction.
"""

from __future__ import annotations

import logging
import os
import time
from contextlib import contextmanager
from logging.handlers import RotatingFileHandler

LOG_FORMAT = "%(asctime)s - %(levelname)s - %(message)s"

logger = logging.getLogger("team_aragon_spark")


def setup_logging(log_file: str = "log_output.txt", level: int = logging.DEBUG) -> logging.Logger:
    """O3: attach a rotating file handler (reference logging_module.py:5-15).

    Idempotent per path: an existing handler for the same file is
    reused, so repeated pipeline invocations in one process don't
    multiply log lines.  Returns the package logger.

    The DEBUG level is applied to the *package* logger only — the root
    logger stays at WARNING.  The reference sets root to DEBUG, but it
    is a one-shot script; in a long-running Spark process a DEBUG root
    would flood the file with py4j/urllib3 chatter on every JVM call.
    """
    logger.setLevel(level)
    root = logging.getLogger()
    if root.level == logging.NOTSET or root.level < logging.WARNING:
        root.setLevel(logging.WARNING)
    target = os.path.abspath(log_file)
    for lg in (root, logger):
        for h in lg.handlers:
            if isinstance(h, RotatingFileHandler) and getattr(h, "baseFilename", None) == target:
                return logger
    handler = RotatingFileHandler(target, mode="w", encoding="utf-8")
    handler.setLevel(level)
    handler.setFormatter(logging.Formatter(LOG_FORMAT))
    root.addHandler(handler)
    return logger


@contextmanager
def timed_load(label: str):
    """O2: wall-clock a load batch; yields a dict whose ``wall_s`` is
    filled in on exit (monotonic clock — immune to NTP steps)."""
    t = {"wall_s": 0.0}
    start = time.monotonic()
    logger.info("%s: load started", label)
    try:
        yield t
    finally:
        t["wall_s"] = time.monotonic() - start
        logger.info("%s: load finished in %.3f s", label, t["wall_s"])

"""Logging setup (reference logger/logger.py equivalent: console + rotating file
handlers, per-process gating for multi-host runs)."""

from __future__ import annotations

import logging
import logging.handlers
import os
import sys
from pathlib import Path
from typing import Optional

VERBOSITY = {0: logging.WARNING, 1: logging.INFO, 2: logging.DEBUG}


def setup_logging(
    log_dir: Optional[str | Path] = None,
    name: str = "oatx",
    verbosity: int = 2,
    process_index: Optional[int] = None,
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(VERBOSITY.get(verbosity, logging.DEBUG))
    logger.propagate = False
    if logger.handlers:
        return logger

    if process_index is None:
        try:
            import jax

            process_index = jax.process_index()
        except Exception:
            process_index = 0

    fmt = logging.Formatter("%(asctime)s %(levelname).1s %(name)s: %(message)s",
                            datefmt="%H:%M:%S")
    if process_index == 0:  # console on the lead host only
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if log_dir is not None:
        Path(log_dir).mkdir(parents=True, exist_ok=True)
        fh = logging.handlers.RotatingFileHandler(
            Path(log_dir) / f"info_p{process_index}.log",
            maxBytes=10 * 1024 * 1024, backupCount=5)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    if not logger.handlers:
        logger.addHandler(logging.NullHandler())
    return logger

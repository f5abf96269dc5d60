"""Logging bootstrap.

The reference uses a YAML dictConfig with two loggers (`calc` DEBUG / `viz`
INFO) and a rich console handler (``pyQSM/log.yml``, ``utils/log_utils.py``).
Here: stdlib logging with the same two named loggers plus a root framework
logger, configured programmatically (no YAML dependency), file + console.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

_FORMAT = "%(asctime)s %(levelname)-7s %(name)s %(funcName)s:%(lineno)d | %(message)s"
_configured = False


def setup_logging(
    level: int = logging.INFO,
    log_file: str | Path | None = "pyqsm_tpu.log",
    calc_level: int = logging.DEBUG,
    viz_level: int = logging.INFO,
) -> None:
    """Configure the framework loggers (idempotent)."""
    global _configured
    if _configured:
        return
    root = logging.getLogger("pyqsm_tpu")
    root.setLevel(level)
    console = logging.StreamHandler(sys.stderr)
    console.setFormatter(logging.Formatter(_FORMAT))
    root.addHandler(console)
    if log_file is not None:
        try:
            fh = logging.FileHandler(log_file)
            fh.setFormatter(logging.Formatter(_FORMAT))
            root.addHandler(fh)
        except OSError:
            pass
    # reference's two-logger scheme (log.yml:30-39)
    logging.getLogger("pyqsm_tpu.calc").setLevel(calc_level)
    logging.getLogger("pyqsm_tpu.viz").setLevel(viz_level)
    _configured = True


def get_logger(name: str = "pyqsm_tpu") -> logging.Logger:
    if not name.startswith("pyqsm_tpu"):
        name = f"pyqsm_tpu.{name}"
    return logging.getLogger(name)

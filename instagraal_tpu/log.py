"""Logging for instagraal_tpu (reference log.py:1-43 equivalent).

Named logger + optional rotating file handler. Level is controlled by the
CLI (--quiet/--debug) via set_level().
"""

from __future__ import annotations

import logging
import logging.handlers
import time

logger = logging.getLogger("instagraal_tpu")

if not logger.handlers:
    _stream = logging.StreamHandler()
    _stream.setFormatter(
        logging.Formatter("%(levelname)s:%(asctime)s:%(name)s: %(message)s")
    )
    logger.addHandler(_stream)
    logger.setLevel(logging.INFO)


def add_file_handler(directory: str = ".") -> None:
    """Attach a rotating file handler instagraal_tpu-<ts>.log (10MB x 5)."""
    ts = time.strftime("%Y%m%d-%H%M%S")
    handler = logging.handlers.RotatingFileHandler(
        f"{directory}/instagraal_tpu-{ts}.log",
        maxBytes=10_000_000,
        backupCount=5,
    )
    handler.setFormatter(
        logging.Formatter("%(levelname)s:%(asctime)s:%(name)s: %(message)s")
    )
    logger.addHandler(handler)


def set_level(quiet: bool = False, debug: bool = False) -> None:
    if debug:
        logger.setLevel(logging.DEBUG)
    elif quiet:
        logger.setLevel(logging.WARNING)
    else:
        logger.setLevel(logging.INFO)

"""Structured logging setup, configured once (the reference repeats
logging.basicConfig in every module, e.g. modules.py:11, train.py:29)."""

from __future__ import annotations

import logging
import sys


def setup_logging(level: int = logging.INFO, process_index: int = 0) -> None:
    """Configure root logging; non-zero processes log at WARNING (rank-0-style gating,
    reference train.py:234-240)."""
    effective = level if process_index == 0 else max(level, logging.WARNING)
    logging.basicConfig(
        level=effective,
        format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
        stream=sys.stderr,
        force=True,
    )

"""Structured logging for the framework.

Mirrors the reference's per-instance adapter pattern (reference:
bayesiancoresets/util/log.py:5-42, coreset/coreset.py:9-10): each algorithm
instance gets a logger tagged with a short random id, a
``levelname - id.funcName(): message`` format, default level ERROR, and a
``set_verbosity`` knob. Replaces the reference's pervasive raw ``print``
debugging with proper log levels.
"""

from __future__ import annotations

import logging
import secrets

LOGLEVELS = {
    "error": logging.ERROR,
    "warning": logging.WARNING,
    "critical": logging.CRITICAL,
    "info": logging.INFO,
    "debug": logging.DEBUG,
}

_FMT = "%(levelname)s - %(id)s.%(funcName)s(): %(message)s"

_root = logging.getLogger("betacores_tpu")
if not _root.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter(_FMT))
    _root.addHandler(_h)
    _root.setLevel(logging.ERROR)
    _root.propagate = False


def set_verbosity(verbosity: str = "error") -> None:
    if verbosity not in LOGLEVELS:
        raise ValueError(f"verbosity must be one of {sorted(LOGLEVELS)}")
    _root.setLevel(LOGLEVELS[verbosity])


def get_logger(name: str) -> logging.LoggerAdapter:
    """Per-instance logger tagged ``<name>-<hex6>``."""
    tag = f"{name}-{secrets.token_hex(3)}"
    return logging.LoggerAdapter(_root, {"id": tag})

"""DEBUG_MODE analog (U5, reference utils.py:22-26).

The reference gates ``cv2.imshow`` debug display on a ``DEBUG_MODE``
env var; a headless distributed engine's analog is structured
per-batch DEBUG logging, gated on ``AOR_DEBUG=1`` (read once per
worker process).  Stages call :func:`debug_log` in their hot loop —
a no-op single boolean check when disabled.
"""

from __future__ import annotations

import logging
import os

_ENABLED = os.environ.get("AOR_DEBUG", "") not in ("", "0")
_LOGGER = logging.getLogger("arabic_ocr_ray")
if _ENABLED and not _LOGGER.handlers:
    h = logging.StreamHandler()
    h.setFormatter(logging.Formatter(
        "%(asctime)s AOR-DEBUG %(message)s"))
    _LOGGER.addHandler(h)
    _LOGGER.setLevel(logging.DEBUG)


def debug_enabled() -> bool:
    return _ENABLED


def debug_log(msg: str, *args) -> None:
    if _ENABLED:
        _LOGGER.debug(msg, *args)

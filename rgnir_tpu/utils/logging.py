"""Structured logging (SURVEY.md section 5: the reference has only
``print``/``st.error``; we emit proper per-image structured records)."""

from __future__ import annotations

import json
import logging
from typing import Any, Dict, Optional


def get_logger(name: str = "rgnir_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger


def log_image_record(
    logger: logging.Logger,
    filename: str,
    shape: tuple,
    stage_ms: Optional[Dict[str, float]] = None,
    stats: Optional[Dict[str, Any]] = None,
    level: int = logging.INFO,
) -> None:
    """One structured line per processed image: filename, shape,
    per-stage milliseconds, headline stats."""
    record = {"file": filename, "shape": list(shape)}
    if stage_ms:
        record["stage_ms"] = {k: round(v, 2) for k, v in stage_ms.items()}
    if stats:
        record["stats"] = stats
    logger.log(level, json.dumps(record))

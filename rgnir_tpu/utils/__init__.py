"""Shared utilities: structured logging, manifests, profiling hooks."""

from rgnir_tpu.utils.logging import get_logger, log_image_record
from rgnir_tpu.utils.manifest import Manifest

__all__ = ["get_logger", "log_image_record", "Manifest"]

"""Shared utilities: structured logging, manifests, profiling hooks,
honest device timing (microbench), measured kernel autotuning."""

from typing import Optional

from rgnir_tpu.utils.compile_cache import enable_persistent_cache
from rgnir_tpu.utils.logging import get_logger, log_image_record
from rgnir_tpu.utils.manifest import Manifest
from rgnir_tpu.utils.microbench import chain_time, chain_time_ab


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Persist compiled executables across processes (SURVEY.md section 5
    checkpoint/resume: the JAX persistent compilation cache) — first-run
    latency for the fused kernels drops from minutes to seconds. The
    default location is the repo's committed ``.jax_cache`` artifact
    (see utils/compile_cache.py), pre-seeded by ``rgnir-tpu warmup``."""
    enable_persistent_cache(path)


__all__ = [
    "get_logger",
    "log_image_record",
    "Manifest",
    "chain_time",
    "chain_time_ab",
    "enable_compilation_cache",
]

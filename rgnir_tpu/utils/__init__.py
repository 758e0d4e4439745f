"""Shared utilities: structured logging, manifests, profiling hooks,
honest device timing (microbench), measured kernel autotuning."""

from rgnir_tpu.utils.logging import get_logger, log_image_record
from rgnir_tpu.utils.manifest import Manifest
from rgnir_tpu.utils.microbench import chain_time, chain_time_ab


def enable_compilation_cache(path: str = "/tmp/rgnir_jax_cache") -> None:
    """Persist compiled executables across processes (SURVEY.md section 5
    checkpoint/resume: the JAX persistent compilation cache) — first-run
    latency for the fused kernels drops from minutes to seconds."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


__all__ = [
    "get_logger",
    "log_image_record",
    "Manifest",
    "chain_time",
    "chain_time_ab",
    "enable_compilation_cache",
]

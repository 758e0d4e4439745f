"""Persistent XLA compilation cache, pre-seedable as a repo artifact.

First compilation of the Pallas-heavy paths through this environment's
tunneled TPU takes *minutes per executable* (the round-2 bench recorded
807 s of cold compile). A ``/tmp`` cache dies with the machine, so the
cache lives in the repo checkout itself (``<repo>/.jax_cache``) and the
warmed entries are committed — a cold machine with a fresh clone hits
the cache on its very first ``bench.py`` run.

Every entry point that compiles the hot paths (bench.py,
benchmarks/run_configs.py, ``__graft_entry__``, the CLI) calls
:func:`enable_persistent_cache` before its first ``jit``; the location
can be overridden with ``RGNIR_COMPILE_CACHE_DIR`` (set it to an empty
string to disable). ``rgnir-tpu warmup`` pre-compiles the bench +
pipeline variants into the cache explicitly.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional


def default_cache_dir() -> Path:
    """``<repo>/.jax_cache`` when running from a checkout (this file is
    at ``<repo>/rgnir_tpu/utils/``), else ``~/.cache/rgnir_tpu/jax``."""
    repo = Path(__file__).resolve().parents[2]
    if (repo / "pyproject.toml").exists():
        return repo / ".jax_cache"
    return Path.home() / ".cache" / "rgnir_tpu" / "jax"


def _cpu_only_platform() -> bool:
    """True when JAX is pinned to the CPU backend (tests, dryruns).

    XLA:CPU serializes AOT executables specialized to the *compiling*
    host's ISA features (AVX-512/AMX sets differ across this fleet), so
    CPU entries must never ride the repo-committed cache to another
    machine — loading one there risks SIGILL or wrong-ISA codegen. TPU
    executables are device-targeted and portable across hosts, so only
    they belong in the committed artifact.
    """
    plats = None
    try:
        import jax

        plats = jax.config.jax_platforms
    except Exception:
        pass
    if not plats:
        plats = os.environ.get("JAX_PLATFORMS", "")
    if not plats:
        return False  # ambient default in this environment is the TPU tunnel
    names = [p.strip().lower() for p in str(plats).split(",") if p.strip()]
    return bool(names) and all(n == "cpu" for n in names)


def enable_persistent_cache(cache_dir: Optional[os.PathLike] = None) -> Optional[Path]:
    """Point JAX's persistent compilation cache at the repo artifact.

    Idempotent; returns the cache dir (or None when disabled via
    ``RGNIR_COMPILE_CACHE_DIR=""``). Safe to call before or after
    backend init — the config is read at compile time. CPU-only
    processes are redirected to a machine-local cache (see
    :func:`_cpu_only_platform`).
    """
    import jax

    if cache_dir is None:
        env = os.environ.get("RGNIR_COMPILE_CACHE_DIR")
        if env is not None:
            if not env:
                return None
            cache_dir = Path(env)
        elif _cpu_only_platform():
            cache_dir = Path("/tmp/rgnir_cpu_cache")
        else:
            cache_dir = default_cache_dir()
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir

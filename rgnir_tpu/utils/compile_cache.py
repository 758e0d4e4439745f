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
        # No explicit platform config: do NOT assume the ambient
        # default is the TPU tunnel — on a CPU-only host that
        # assumption would commit host-ISA-specific CPU executables to
        # the repo cache (SIGILL hazard on other machines). Ask the
        # backend itself; default_backend() initializes it, which is
        # acceptable here because every caller compiles immediately
        # after this anyway.
        try:
            import jax

            return jax.default_backend() == "cpu"
        except Exception:
            return True  # cannot prove TPU -> keep the repo cache safe
    names = [p.strip().lower() for p in str(plats).split(",") if p.strip()]
    return bool(names) and all(n == "cpu" for n in names)


def machine_local_cache_dir(kind: str) -> Path:
    """A per-user machine-local cache dir for compiles that must NOT
    land in the repo-committed artifact (CPU executables, tune sweeps,
    selftest one-offs). Per-user (XDG-style under ``~/.cache``) rather
    than a fixed ``/tmp`` path: a world-writable shared path could be
    pre-created by another user and seeded with poisoned serialized
    executables that this user's process would then load."""
    d = Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache"))
    d = d / "rgnir_tpu" / kind
    d.mkdir(parents=True, exist_ok=True)
    try:
        os.chmod(d, 0o700)
    except OSError:
        pass
    return d


_KERNEL_KEYS_PATCHED = False


def stabilize_kernel_cache_keys() -> bool:
    """Make Pallas/Mosaic executables' persistent-cache keys invariant
    to source line shifts and module import identity.

    JAX's cache key strips top-level StableHLO debug info by default
    (``compilation_cache_include_metadata_in_key=False``), so plain jit
    keys are already stable across edits. But a Pallas TPU kernel rides
    inside a ``stablehlo.custom_call`` whose ``backend_config`` is the
    Mosaic module serialized WITH debug info
    (tpu_custom_call.py ``_lower_mosaic_module_to_asm`` /
    ``get_asm(enable_debug_info=True)``) — opaque bytes the top-level
    ``strip-debuginfo`` pass cannot reach. Every commit that shifts a
    line on a kernel's trace path therefore used to change the key and
    silently stale the committed cache (the round-3 failure: warmed
    ``jit_forward`` entries predating three trace-adjacent commits).

    Fix: run ``strip-debuginfo`` on the Mosaic module itself before
    serialization. Measured: identical kernels defined at different
    file offsets/modules hash to the SAME computation key after this
    patch, different keys before it. Locations in Mosaic compile errors
    are lost — acceptable for a production cache; set
    ``RGNIR_STABLE_KERNEL_KEYS=0`` to debug a kernel with locations.

    Idempotent; returns True when the patch is active.
    """
    global _KERNEL_KEYS_PATCHED
    if _KERNEL_KEYS_PATCHED:
        return True
    if os.environ.get("RGNIR_STABLE_KERNEL_KEYS", "1") == "0":
        return False
    try:
        from typing import cast

        import jax._src.tpu_custom_call as tcc
        from jax._src.lib.mlir import ir
        from jax._src.lib.mlir import passmanager as pm
    except Exception:  # pragma: no cover - jax internals moved
        return False

    orig = tcc._lower_mosaic_module_to_asm

    def _stripped(module, **kw):
        try:
            with module.context:
                m = module.operation.clone()
                pm.PassManager.parse(
                    "builtin.module(strip-debuginfo)"
                ).run(m)
            module = cast(ir.Module, m)
        except Exception:  # never break lowering over key hygiene
            pass
        return orig(module, **kw)

    tcc._lower_mosaic_module_to_asm = _stripped
    _KERNEL_KEYS_PATCHED = True
    return True


def enable_persistent_cache(cache_dir: Optional[os.PathLike] = None) -> Optional[Path]:
    """Point JAX's persistent compilation cache at the repo artifact.

    Idempotent; returns the cache dir (or None when disabled via
    ``RGNIR_COMPILE_CACHE_DIR=""``). Safe to call before or after
    backend init — the config is read at compile time. CPU-only
    processes are redirected to a machine-local cache (see
    :func:`_cpu_only_platform`).
    """
    import jax

    stabilize_kernel_cache_keys()
    if cache_dir is None:
        env = os.environ.get("RGNIR_COMPILE_CACHE_DIR")
        if env is not None:
            if not env:
                return None
            cache_dir = Path(env)
        elif _cpu_only_platform():
            # Per-user location (not a fixed /tmp path another user
            # could pre-create and seed with poisoned executables).
            cache_dir = machine_local_cache_dir("cpu")
        else:
            cache_dir = default_cache_dir()
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    # Persist EVERY compile, not just slow ones. JAX's default 1 s
    # threshold makes the committed cache contention-dependent: a jit
    # that compiles in 0.9 s during `warmup` is silently NOT persisted,
    # then the driver's identical run in a slower window compiles it in
    # 1.1 s and writes a new entry — `warmup --check` passes or fails
    # with the weather. Observed live (2026-08-20): the warmup bench
    # run skipped persisting jit__band_joint_hists; the driver-shaped
    # rerun minutes later persisted it. Small-jit clutter is bounded
    # (tens of KB) and determinism of the staleness gate wins.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir

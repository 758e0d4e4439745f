"""Persistent-compile-cache hygiene.

The repo-committed ``.jax_cache`` is the round-3 answer to the 807 s
cold compile recorded in BENCH_r02.json — a fresh clone must hit warm
TPU entries on its first ``bench.py`` run. That only works if the
committed artifact stays *TPU-only*: XLA:CPU serializes AOT executables
specialized to the compiling host's ISA (AVX-512/AMX differ across
machines), so a committed CPU entry can SIGILL — or, worse, silently
change numerics — on the next machine. These tests pin both halves of
the fix: CPU-only processes are redirected away from the repo cache,
and no tracked cache entry embeds x86 object code.
"""

from __future__ import annotations

import os
import subprocess
import zlib
from pathlib import Path

import jax
import pytest

from rgnir_tpu.utils import compile_cache as cc

REPO = Path(__file__).resolve().parents[1]


def _restore_cache_dir():
    # The test session's conftest points the process-global cache at
    # /tmp/jax_test_cache; put it back after we exercise the setter.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")


def test_cpu_only_platform_detected_under_test_env():
    # conftest pins JAX_PLATFORMS=cpu for the whole suite.
    assert cc._cpu_only_platform() is True


def test_cpu_process_redirects_away_from_repo_cache():
    try:
        d = cc.enable_persistent_cache()
        assert d is not None
        assert d != cc.default_cache_dir()
        assert ".jax_cache" not in str(d)
    finally:
        _restore_cache_dir()


def test_explicit_dir_wins_over_cpu_redirect(tmp_path):
    try:
        d = cc.enable_persistent_cache(tmp_path / "cache")
        assert d == tmp_path / "cache"
        assert d.is_dir()
    finally:
        _restore_cache_dir()


def test_env_override_wins_over_cpu_redirect(tmp_path, monkeypatch):
    monkeypatch.setenv("RGNIR_COMPILE_CACHE_DIR", str(tmp_path / "envcache"))
    try:
        d = cc.enable_persistent_cache()
        assert d == tmp_path / "envcache"
        monkeypatch.setenv("RGNIR_COMPILE_CACHE_DIR", "")
        assert cc.enable_persistent_cache() is None
    finally:
        _restore_cache_dir()


def test_stabilize_kernel_cache_keys_patches_mosaic_serialization():
    """Pallas cache keys must not depend on kernel source line numbers.

    JAX strips top-level StableHLO debuginfo from the persistent-cache
    key, but the Mosaic kernel payload inside the custom_call's
    backend_config is serialized WITH debug info — so any line-shifting
    commit used to stale every Pallas entry in the committed cache
    (the round-3 failure). stabilize_kernel_cache_keys() prepends a
    strip-debuginfo pass; measured on the TPU backend: identical
    kernels at different file offsets hash identically after the patch,
    differently before. Here (CPU suite) we pin the patch mechanics.
    """
    import jax._src.tpu_custom_call as tcc

    orig_name = tcc._lower_mosaic_module_to_asm.__name__
    assert cc.stabilize_kernel_cache_keys() is True
    assert tcc._lower_mosaic_module_to_asm.__name__ == "_stripped"
    # Idempotent: a second call must not double-wrap.
    wrapped = tcc._lower_mosaic_module_to_asm
    assert cc.stabilize_kernel_cache_keys() is True
    assert tcc._lower_mosaic_module_to_asm is wrapped
    assert orig_name in ("_lower_mosaic_module_to_asm", "_stripped")


def test_stabilize_kernel_keys_respects_opt_out(monkeypatch):
    monkeypatch.setenv("RGNIR_STABLE_KERNEL_KEYS", "0")
    monkeypatch.setattr(cc, "_KERNEL_KEYS_PATCHED", False)
    assert cc.stabilize_kernel_cache_keys() is False


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs the TPU backend"
)
def test_kernel_cache_key_invariant_to_line_shifts(tmp_path):
    """End-to-end on real TPU lowering: the computation hash of a
    Pallas call is identical across source line offsets and module
    identities once the patch is active."""
    import hashlib
    import importlib.util
    import sys

    from jax._src import cache_key as ck

    cc.stabilize_kernel_cache_keys()
    src = (
        "import jax, jax.numpy as jnp\n"
        "from jax.experimental import pallas as pl\n"
        "def kern(x_ref, o_ref):\n"
        "    o_ref[...] = x_ref[...] * 2.0 + 1.0\n"
        "def f(x):\n"
        "    return pl.pallas_call(kern, out_shape="
        "jax.ShapeDtypeStruct(x.shape, x.dtype))(x)\n"
    )
    hashes = []
    for name, pad in (("_ckexp_a", 0), ("_ckexp_b", 31)):
        p = tmp_path / f"{name}.py"
        p.write_text("\n" * pad + src)
        spec = importlib.util.spec_from_file_location(name, p)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = spec.loader.exec_module(mod) or mod
        lowered = jax.jit(mod.f).lower(
            jax.ShapeDtypeStruct((256, 256), jax.numpy.float32)
        )
        h = hashlib.sha256()
        ck._hash_computation(h, lowered.compiler_ir(), ck.IgnoreCallbacks.NO)
        hashes.append(h.hexdigest())
    assert hashes[0] == hashes[1]


def _decompress(raw: bytes) -> bytes:
    if raw[:4] == b"\x28\xb5\x2f\xfd":
        zstd = pytest.importorskip("zstandard")
        return zstd.ZstdDecompressor().decompress(raw, max_output_size=1 << 30)
    try:
        return zlib.decompress(raw)
    except zlib.error:
        return raw


def test_committed_cache_entries_are_not_cpu_executables():
    """No tracked .jax_cache entry may embed x86 ELF object code."""
    try:
        out = subprocess.run(
            ["git", "ls-files", ".jax_cache"],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=30,
            check=True,
        ).stdout
    except (OSError, subprocess.SubprocessError):
        pytest.skip("not a git checkout")
    tracked = [REPO / line for line in out.splitlines() if line.strip()]
    if not tracked:
        pytest.skip("no committed cache entries")
    offenders = []
    for path in tracked:
        if not path.is_file():
            continue  # deleted in the working tree (purge in flight)
        data = _decompress(path.read_bytes())
        if b"\x7fELF" in data and (b"x86_64" in data or b"x86-64" in data):
            offenders.append(path.name)
    assert not offenders, (
        "CPU AOT executables committed to the repo cache (host-ISA "
        f"specific; purge them): {offenders}"
    )


def test_committed_cache_stays_bounded():
    """Regression gate for the committed artifact's size (round-4
    verdict: threshold-0 persistence grew it to 113 MB / 134 entries
    with no prune mechanism). `rgnir-tpu warmup --prune` rebuilds the
    cache to exactly the driver-shaped entry set; this test fails the
    suite when the tracked artifact balloons past that set's budget so
    growth is caught in the round that causes it."""
    try:
        out = subprocess.run(
            ["git", "ls-files", ".jax_cache"],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=30,
            check=True,
        ).stdout
    except (OSError, subprocess.SubprocessError):
        pytest.skip("not a git checkout")
    tracked = [REPO / line for line in out.splitlines() if line.strip()]
    tracked = [p for p in tracked if p.is_file()]
    if not tracked:
        pytest.skip("no committed cache entries")
    n = len(tracked)
    mb = sum(p.stat().st_size for p in tracked) / 1e6
    assert n <= 150, (
        f"{n} committed cache entries (>150): run "
        "`rgnir-tpu warmup --prune` and commit the rebuilt cache"
    )
    assert mb <= 130, (
        f"committed cache is {mb:.0f} MB (>130 MB): run "
        "`rgnir-tpu warmup --prune` and commit the rebuilt cache"
    )

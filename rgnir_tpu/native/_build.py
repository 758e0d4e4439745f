"""Shared compile-on-first-use loader for the native C++ extensions.

Both extensions (framering, imgio) follow the same lifecycle: rebuild
with g++ when the source is newer than the cached .so, load via ctypes,
register the C ABI signatures, memoize the handle (or the first build
error) under a lock. One implementation here keeps the mtime check,
compiler invocation, and error capture in a single place.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Callable, List, Optional


class NativeLib:
    """Lazily-built ctypes library with memoized load state."""

    def __init__(
        self,
        src: Path,
        so: Path,
        link_flags: List[str],
        register: Callable[[ctypes.CDLL], None],
        try_native_arch: bool = False,
    ) -> None:
        self._src = src
        self._so = so
        self._link_flags = list(link_flags)
        self._register = register
        # The .so is built ON the host that runs it (never shipped), so
        # -march=native is safe and unlocks AVX-512 paths guarded by
        # #ifdef in the source; retried without the flag if the local
        # toolchain rejects it (non-x86, old g++).
        self._try_native_arch = try_native_arch
        self._lock = threading.Lock()
        self._lib: Optional[ctypes.CDLL] = None
        self._error: Optional[str] = None

    def load(self) -> Optional[ctypes.CDLL]:
        with self._lock:
            if self._lib is not None or self._error is not None:
                return self._lib
            try:
                if (
                    not self._so.exists()
                    or self._so.stat().st_mtime < self._src.stat().st_mtime
                ):
                    # Compile to a per-pid temp path and os.replace() it
                    # in, so a concurrent process can never dlopen a
                    # half-written .so (and memoize that as a permanent
                    # build failure).
                    tmp = self._so.with_suffix(f".tmp{os.getpid()}.so")
                    try:
                        attempts = (
                            (["-march=native"], [])
                            if self._try_native_arch else ([],)
                        )
                        for i, extra in enumerate(attempts):
                            try:
                                subprocess.run(
                                    ["g++", "-O3", *extra, "-std=c++17",
                                     "-shared", "-fPIC", str(self._src),
                                     "-o", str(tmp), *self._link_flags],
                                    check=True, capture_output=True,
                                    text=True,
                                )
                                break
                            except subprocess.CalledProcessError:
                                if i == len(attempts) - 1:
                                    raise
                        os.replace(tmp, self._so)
                    finally:
                        tmp.unlink(missing_ok=True)
                lib = ctypes.CDLL(str(self._so))
            except (subprocess.CalledProcessError, OSError) as e:
                self._error = getattr(e, "stderr", None) or str(e)
                return None
            self._register(lib)
            self._lib = lib
            return lib

    @property
    def error(self) -> Optional[str]:
        return self._error

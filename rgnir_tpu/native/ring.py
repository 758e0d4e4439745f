"""ctypes wrapper for the C++ shared-memory frame ring (framering.cpp).

Compiles the extension on first use (g++ -O3, cached next to the
source; rebuilt when the source is newer). Producer and consumer may
live in different processes: create the ring in one, ``FrameRing.open``
it by name in the other.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "framering.cpp"
_SO = _DIR / "_framering.so"
_LOCK = threading.Lock()
_LIB = None
_BUILD_ERROR: Optional[str] = None


def _load():
    global _LIB, _BUILD_ERROR
    with _LOCK:
        if _LIB is not None or _BUILD_ERROR is not None:
            return _LIB
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     str(_SRC), "-o", str(_SO)],
                    check=True, capture_output=True, text=True,
                )
            lib = ctypes.CDLL(str(_SO))
        except (subprocess.CalledProcessError, OSError) as e:
            _BUILD_ERROR = getattr(e, "stderr", None) or str(e)
            return None
        lib.fr_create.restype = ctypes.c_void_p
        lib.fr_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                  ctypes.c_uint64]
        lib.fr_open.restype = ctypes.c_void_p
        lib.fr_open.argtypes = [ctypes.c_char_p]
        lib.fr_try_push.restype = ctypes.c_int
        lib.fr_try_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.fr_try_pop.restype = ctypes.c_int
        lib.fr_try_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        for fn in ("fr_size", "fr_capacity", "fr_frame_bytes"):
            getattr(lib, fn).restype = ctypes.c_uint64
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        lib.fr_close.restype = None
        lib.fr_close.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load() is not None


class FrameRing:
    """Lock-free SPSC ring of fixed-shape uint8 frames in POSIX shm."""

    def __init__(self, handle, frame_shape: Tuple[int, ...], owner: bool):
        self._h = handle
        self.frame_shape = tuple(frame_shape)
        self._owner = owner
        self._lib = _load()

    # -- constructors -----------------------------------------------------
    @classmethod
    def create(cls, name: str, frame_shape: Tuple[int, ...],
               capacity: int = 8) -> "FrameRing":
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native framering unavailable: {_BUILD_ERROR}")
        nbytes = int(np.prod(frame_shape))
        h = lib.fr_create(name.encode(), nbytes, capacity)
        if not h:
            raise OSError(f"fr_create failed for {name!r}")
        return cls(h, frame_shape, owner=True)

    @classmethod
    def open(cls, name: str, frame_shape: Tuple[int, ...]) -> "FrameRing":
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native framering unavailable: {_BUILD_ERROR}")
        h = lib.fr_open(name.encode())
        if not h:
            raise OSError(f"fr_open failed for {name!r}")
        ring = cls(h, frame_shape, owner=False)
        if lib.fr_frame_bytes(h) != int(np.prod(frame_shape)):
            lib.fr_close(h, 0)
            raise ValueError("frame_shape does not match the ring")
        return ring

    # -- operations --------------------------------------------------------
    def try_push(self, frame: np.ndarray) -> bool:
        frame = np.ascontiguousarray(frame, dtype=np.uint8)
        if frame.shape != self.frame_shape:
            raise ValueError(f"{frame.shape} != {self.frame_shape}")
        return bool(self._lib.fr_try_push(
            self._h, frame.ctypes.data_as(ctypes.c_void_p)
        ))

    def try_pop(self) -> Optional[np.ndarray]:
        out = np.empty(self.frame_shape, dtype=np.uint8)
        ok = self._lib.fr_try_pop(
            self._h, out.ctypes.data_as(ctypes.c_void_p)
        )
        return out if ok else None

    def __len__(self) -> int:
        return int(self._lib.fr_size(self._h))

    @property
    def capacity(self) -> int:
        return int(self._lib.fr_capacity(self._h))

    def close(self) -> None:
        if self._h:
            self._lib.fr_close(self._h, 1 if self._owner else 0)
            self._h = None

    def __enter__(self) -> "FrameRing":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

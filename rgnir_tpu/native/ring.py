"""ctypes wrapper for the C++ shared-memory frame ring (framering.cpp).

Compiles the extension on first use (g++ -O3, cached next to the
source; rebuilt when the source is newer). Producer and consumer may
live in different processes: create the ring in one, ``FrameRing.open``
it by name in the other.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from rgnir_tpu.native._build import NativeLib

_DIR = Path(__file__).resolve().parent


def _register(lib: ctypes.CDLL) -> None:
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
    lib.fr_finish.restype = None
    lib.fr_finish.argtypes = [ctypes.c_void_p]
    lib.fr_eof.restype = ctypes.c_int
    lib.fr_eof.argtypes = [ctypes.c_void_p]
    lib.fr_close.restype = None
    lib.fr_close.argtypes = [ctypes.c_void_p, ctypes.c_int]


_NATIVE = NativeLib(
    _DIR / "framering.cpp", _DIR / "_framering.so", [], _register
)


def _load():
    return _NATIVE.load()


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
            raise RuntimeError(f"native framering unavailable: {_NATIVE.error}")
        nbytes = int(np.prod(frame_shape))
        h = lib.fr_create(name.encode(), nbytes, capacity)
        if not h:
            raise OSError(f"fr_create failed for {name!r}")
        return cls(h, frame_shape, owner=True)

    @classmethod
    def open(cls, name: str, frame_shape: Tuple[int, ...]) -> "FrameRing":
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native framering unavailable: {_NATIVE.error}")
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
        frame = np.asarray(frame)
        if frame.dtype != np.uint8:
            # A silent value cast (float [0,1] -> 0, int16 300 -> 44)
            # would feed the consumer corrupted frames; mirror the
            # shape check and make the producer convert explicitly.
            raise TypeError(f"frame dtype {frame.dtype} != uint8")
        frame = np.ascontiguousarray(frame)
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

    def finish(self) -> None:
        """Producer end-of-stream: call after the final push. Consumers
        that see ``eof`` and then an empty pop have seen every frame
        (release/acquire ordering in the header)."""
        self._lib.fr_finish(self._h)

    @property
    def eof(self) -> bool:
        return bool(self._lib.fr_eof(self._h))

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

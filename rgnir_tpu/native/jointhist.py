"""ctypes bindings for the native host joint-histogram accumulator.

See jointhist.cpp for why this exists: the streamed gigapixel path's
statistics are a pure function of per-pair 256x256 joint histograms,
and when the host->device wire is orders of magnitude slower than host
DRAM (this environment's tunnel), accumulating those histograms on the
host is the faster *exact* route. Falls back to a numpy ``bincount``
implementation when the toolchain is unavailable, so
``accumulate(...)`` always works.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

from rgnir_tpu.native._build import NativeLib

_DIR = Path(__file__).resolve().parent


def _register(lib: ctypes.CDLL) -> None:
    lib.jh_accumulate.restype = ctypes.c_int
    lib.jh_accumulate.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
    ]


_NATIVE = NativeLib(
    _DIR / "jointhist.cpp", _DIR / "_jointhist.so", ["-lpthread"],
    _register, try_native_arch=True,
)


def native_available() -> bool:
    return _NATIVE.load() is not None


def accumulate(
    flat: np.ndarray,
    pairs: Sequence[Tuple[int, int]],
    out: Optional[np.ndarray] = None,
    n_threads: int = 0,
) -> np.ndarray:
    """Add the per-pair 256x256 joint histograms of ``flat`` into
    ``out``.

    Args:
      flat: (N, C) C-contiguous uint8 pixel rows.
      pairs: (channel_a, channel_b) index pairs into [0, C).
      out: (len(pairs), 256, 256) uint32 to accumulate into (allocated
        zeroed when None). The caller must flush to a wider dtype
        before any bin could reach 2**32 (one band is always safe).
      n_threads: 0 = hardware concurrency; 1 = single-threaded.

    Returns:
      ``out``. Identical counts from the native and numpy routes
      (tests/test_native.py).
    """
    if flat.ndim != 2 or flat.dtype != np.uint8:
        raise ValueError(f"need (N, C) uint8, got {flat.shape} {flat.dtype}")
    flat = np.ascontiguousarray(flat)
    n, stride = flat.shape
    npairs = len(pairs)
    if out is None:
        out = np.zeros((npairs, 256, 256), dtype=np.uint32)
    elif (
        out.shape != (npairs, 256, 256)
        or out.dtype != np.uint32
        or not out.flags.c_contiguous
    ):
        raise ValueError("out must be C-contiguous (P, 256, 256) uint32")
    for ia, ib in pairs:
        if not (0 <= ia < stride and 0 <= ib < stride):
            raise ValueError(f"pair ({ia}, {ib}) out of range for C={stride}")

    lib = _NATIVE.load()
    if lib is not None:
        ca = (ctypes.c_int * npairs)(*[p[0] for p in pairs])
        cb = (ctypes.c_int * npairs)(*[p[1] for p in pairs])
        rc = lib.jh_accumulate(
            flat.ctypes.data_as(ctypes.c_void_p), n, stride, ca, cb,
            npairs, out.ctypes.data_as(ctypes.c_void_p), n_threads,
        )
        if rc != 0:
            raise ValueError("jh_accumulate rejected its arguments")
        return out

    # numpy fallback: one bincount of the packed 16-bit key per pair
    for p, (ia, ib) in enumerate(pairs):
        key = (flat[:, ia].astype(np.uint32) << 8) | flat[:, ib]
        out[p] += np.bincount(key, minlength=65536).astype(
            np.uint32
        ).reshape(256, 256)
    return out

"""Interleaved A/B of host joint-histogram loop variants.

The shared 1-core host's throughput swings ~3x with co-tenant load
(BENCHMARKS.md cold-start section), so sequential absolutes lie:
variants are timed INTERLEAVED round-robin and compared by per-variant
median over many rounds, on the three canonical contents (uniform
noise = the bench's config-7 synthetic and the coalescing worst case;
64-px runs = natural orthomosaic content; 2-bin ripple = the
pathological alternator).

Usage: python benchmarks/exp_jointhist.py [--mpix 32] [--rounds 9]
                                          [--native-arch]
"""

from __future__ import annotations

import argparse
import ctypes
import statistics
import subprocess
import tempfile
import time
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
VARIANTS = ["jh_v0", "jh_v1", "jh_v2", "jh_v3"]


def build(native_arch: bool) -> ctypes.CDLL:
    src = HERE / "exp_jointhist.cpp"
    out = Path(tempfile.mkdtemp()) / "exp_jointhist.so"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           str(src), "-o", str(out)]
    if native_arch:
        cmd.insert(2, "-march=native")
    subprocess.run(cmd, check=True)
    lib = ctypes.CDLL(str(out))
    for name in VARIANTS:
        fn = getattr(lib, name)
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32),
        ]
        fn.restype = None
    return lib


def contents(mpix: float) -> dict:
    n = int(mpix * 1e6)
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    runs = np.repeat(
        rng.integers(0, 256, (n // 64 + 1, 3), dtype=np.uint8), 64, axis=0
    )[:n]
    ripple = np.empty((n, 3), dtype=np.uint8)
    ripple[0::2] = 37
    ripple[1::2] = 201
    return {"noise": noise, "runs64": runs, "ripple": ripple}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mpix", type=float, default=32.0)
    ap.add_argument("--rounds", type=int, default=9)
    ap.add_argument("--native-arch", action="store_true")
    args = ap.parse_args()

    lib = build(args.native_arch)
    if args.native_arch:
        for name in ("jh_v4", "jh_v5"):
            try:
                fn = getattr(lib, name)
            except AttributeError:
                continue
            fn.argtypes = getattr(lib, "jh_v0").argtypes
            fn.restype = None
            VARIANTS.append(name)
    data = contents(args.mpix)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)

    # Correctness first: every variant must produce the exact histogram.
    small = data["noise"][: 1 << 16].copy()
    ref = None
    for name in VARIANTS:
        h = np.zeros(65536, dtype=np.uint32)
        getattr(lib, name)(
            small.ctypes.data_as(u8p), small.shape[0], 3, 0, 2,
            h.ctypes.data_as(u32p),
        )
        if ref is None:
            ref = h
        else:
            assert np.array_equal(h, ref), f"{name} disagrees with v0"

    for label, px in data.items():
        times = {name: [] for name in VARIANTS}
        n = px.shape[0]
        for _ in range(args.rounds):
            for name in VARIANTS:
                h = np.zeros(65536, dtype=np.uint32)
                t0 = time.perf_counter()
                getattr(lib, name)(
                    px.ctypes.data_as(u8p), n, 3, 0, 2,
                    h.ctypes.data_as(u32p),
                )
                times[name].append(time.perf_counter() - t0)
        row = {
            name: round(n / 1e6 / statistics.median(ts), 1)
            for name, ts in times.items()
        }
        print(f"{label:8s} MPix/s: {row}", flush=True)


if __name__ == "__main__":
    main()

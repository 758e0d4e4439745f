"""Host ingest throughput: PIL vs the native batch decoder.

Generates a directory of TIFF / PNG / JPEG frames, then times
per-format:
  - PIL decode_file (the reference's ingest path, one image at a time),
  - native imgio.decode_file (single image, GIL-free C call),
  - native imgio.decode_batch (C++ thread pool into one arena).

Host-side only (no TPU). On this 1-core host the pool adds nothing —
the per-image delta is the codec-overhead saving; on a real multi-core
ingest host the batch path scales with cores.

Usage: python benchmarks/exp_ingest.py [n_frames] [size]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

from PIL import Image  # noqa: E402

from rgnir_tpu.io.decode import decode_file  # noqa: E402
from rgnir_tpu.native import imgio  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    if not imgio.native_available():
        print(json.dumps({"error": imgio.build_error()}))
        return
    rng = np.random.default_rng(0)
    tmp = Path(tempfile.mkdtemp(prefix="rgnir_ingest_"))
    mpix = n * size * size / 1e6

    for fmt, ext, kwargs in (
        ("tiff", ".tif", {}),
        ("png", ".png", {}),
        ("jpeg", ".jpg", {"quality": 92}),
    ):
        paths = []
        for i in range(n):
            img = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
            p = tmp / f"{fmt}_{i}{ext}"
            Image.fromarray(img).save(p, **kwargs)
            paths.append(p)

        def timed(fn, reps=2):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return best

        t_pil = timed(lambda: [decode_file(p) for p in paths])
        t_nat = timed(lambda: [imgio.decode_file(p) for p in paths])
        t_arena = timed(
            lambda: imgio.decode_batch(paths, shape=(size, size))
        )
        print(json.dumps({
            "format": fmt, "n": n, "size": size,
            "pil_mpix_s": round(mpix / t_pil, 1),
            "native_mpix_s": round(mpix / t_nat, 1),
            "native_batch_mpix_s": round(mpix / t_arena, 1),
            "speedup_single": round(t_pil / t_nat, 2),
            "speedup_batch": round(t_pil / t_arena, 2),
        }), flush=True)


if __name__ == "__main__":
    main()

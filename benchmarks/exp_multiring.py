"""Aggregate multi-stream throughput through the ring demux.

N producer PROCESSES push pre-generated 1080p frames into per-stream
shared-memory rings as fast as they can; the consumer demuxes them into
one batched StreamAnalyzer (3 indices, stats only) and we record the
aggregate frames/s and the implied number of parallel 30 fps streams.

Caveat recorded with the number: this host has ONE CPU core, so the
producers, the ring copies, and the batch-stack all share it — on a
production host (producers on their own cores/machines) the consumer
side alone binds. The single-core figure is therefore a LOWER bound.

Usage: python benchmarks/exp_multiring.py [n_streams] [frames_per_stream] [batch]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

SHAPE = (1080, 1920, 3)


def producer(name: str, count: int) -> None:
    from rgnir_tpu.native.ring import FrameRing

    ring = FrameRing.open(name, SHAPE)
    rng = np.random.default_rng(hash(name) % 2**32)
    frame = rng.integers(0, 256, SHAPE, dtype=np.uint8)
    sent = 0
    while sent < count:
        if ring.try_push(frame):
            sent += 1
        else:
            time.sleep(0.0002)
    ring.finish()
    ring.close()


def main() -> None:
    from rgnir_tpu.native.ring import FrameRing
    from rgnir_tpu.pipeline.streaming import StreamAnalyzer
    from rgnir_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    per_stream = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    analyzer = StreamAnalyzer(
        frame_shape=SHAPE[:2], kinds=("NDVI", "GNDVI", "NDWI"),
        with_renders=False, batch=batch,
    )
    analyzer.warmup()

    ctx = mp.get_context("spawn")
    rings, procs = [], []
    try:
        for si in range(n_streams):
            name = f"/rgnir_bench_ring_{si}"
            rings.append(FrameRing.create(name, SHAPE, capacity=4))
            p = ctx.Process(target=producer, args=(name, per_stream))
            procs.append(p)
        t0 = time.perf_counter()
        for p in procs:
            p.start()
        n_done = 0
        last = None
        for si, seq, res in analyzer.run_from_rings(rings):
            n_done += 1
            last = res
        # force the final batch's device work to completion
        float(last.stats["NDVI"].mean)
        dt = time.perf_counter() - t0
        for p in procs:
            p.join(timeout=10)
    finally:
        for r in rings:
            r.close()
    total = n_streams * per_stream
    assert n_done == total, (n_done, total)
    fps = total / dt
    print(json.dumps({
        "config": "multiring_demux_1080p_3idx",
        "n_streams": n_streams,
        "batch": batch,
        "frames": total,
        "seconds": round(dt, 2),
        "aggregate_fps": round(fps, 1),
        "parallel_30fps_streams": int(fps // 30),
        "note": "single-core host: producers+copies+consumer share one CPU",
    }))


if __name__ == "__main__":
    main()

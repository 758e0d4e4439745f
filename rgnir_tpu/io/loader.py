"""Async batching loader: decode pool -> shape buckets -> prefetch queue.

XLA wants static shapes; real directories hold ragged image sizes. The
loader buckets decoded images by (H, W), emits a batch when a bucket
reaches ``batch_size``, and flushes remainders at the end — each
distinct shape costs one compile, each full batch amortizes it.
Decoding runs in a thread pool ahead of consumption (bounded prefetch
queue provides backpressure), so device steps overlap host decode.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Callable, Iterator, List, Optional, Sequence, Tuple, Union

import numpy as np

from rgnir_tpu.config import LoaderConfig
from rgnir_tpu.io.decode import decode_file_fast


@dataclasses.dataclass
class LoadedBatch:
    """A same-shape batch ready for the device."""

    images: np.ndarray            # (B, H, W, 3) uint8
    paths: List[Path]             # per-item source path
    indices: List[int]            # positions in the original listing


@dataclasses.dataclass
class LoadFailure:
    path: Path
    index: int
    error: Exception


class BatchLoader:
    """Iterate a file list as shape-bucketed uint8 batches.

    Decode failures do not abort the stream (the reference's batch loop
    prints-and-continues, backend-process.py:93-97); they are collected
    in ``failures`` for the caller to report.
    """

    def __init__(
        self,
        paths: Sequence[Union[str, Path]],
        cfg: LoaderConfig = LoaderConfig(),
        decode: Callable[[Path], np.ndarray] = decode_file_fast,
    ):
        self.paths = [Path(p) for p in paths]
        self.cfg = cfg
        self.decode = decode
        self.failures: List[LoadFailure] = []

    def __iter__(self) -> Iterator[LoadedBatch]:
        cfg = self.cfg
        out_q: "queue.Queue" = queue.Queue(
            maxsize=max(2, cfg.prefetch_batches) * max(1, cfg.batch_size)
        )
        _SENTINEL = object()

        def produce() -> None:
            # Sliding submission window: at most out_q.maxsize decodes
            # in flight, each future dropped as soon as its result is
            # enqueued — memory stays bounded by the prefetch depth no
            # matter how large the directory is (out_q.put blocks when
            # the consumer falls behind, which stalls new submissions).
            window = out_q.maxsize
            inflight: deque = deque()
            path_iter = iter(enumerate(self.paths))
            with ThreadPoolExecutor(cfg.decode_workers) as pool:
                def submit_next() -> bool:
                    try:
                        i, p = next(path_iter)
                    except StopIteration:
                        return False
                    inflight.append((i, p, pool.submit(self.decode, p)))
                    return True

                for _ in range(window):
                    if not submit_next():
                        break
                while inflight:
                    i, p, fut = inflight.popleft()
                    try:
                        out_q.put((i, p, fut.result(), None))
                    except Exception as e:  # noqa: BLE001 - continue-on-error
                        out_q.put((i, p, None, e))
                    submit_next()
            out_q.put(_SENTINEL)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()

        buckets: dict = {}
        while True:
            item = out_q.get()
            if item is _SENTINEL:
                break
            i, p, arr, err = item
            if err is not None:
                self.failures.append(LoadFailure(path=p, index=i, error=err))
                continue
            key = arr.shape
            bucket = buckets.setdefault(key, ([], [], []))
            bucket[0].append(arr)
            bucket[1].append(p)
            bucket[2].append(i)
            if len(bucket[0]) >= self.cfg.batch_size:
                del buckets[key]
                yield LoadedBatch(
                    images=np.stack(bucket[0]),
                    paths=bucket[1],
                    indices=bucket[2],
                )
        for arrs, paths, idxs in buckets.values():  # flush remainders
            yield LoadedBatch(images=np.stack(arrs), paths=paths, indices=idxs)
        producer.join()

"""Async encode/write pool.

Encoding (PNG deflate / TIFF) is CPU work the device shouldn't wait on;
``AsyncWriter`` queues arrays to a thread pool and surfaces errors on
``close()``. The reference writes synchronously inside its loops
(backend-process.py:57, 72).
"""

from __future__ import annotations

import io
from concurrent.futures import Future, ThreadPoolExecutor
from pathlib import Path
from typing import List, Optional, Tuple, Union

import numpy as np
from PIL import Image


def encode_png(array: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(np.asarray(array)).save(buf, format="PNG")
    return buf.getvalue()


def _write_array(path: Path, array: np.ndarray) -> Path:
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.asarray(array)).save(path)
    return path


def _write_image(path: Path, img: Image.Image) -> Path:
    path.parent.mkdir(parents=True, exist_ok=True)
    img.save(path)
    return path


class AsyncWriter:
    """Thread-pooled image writer with error collection."""

    def __init__(self, workers: int = 4):
        self.pool = ThreadPoolExecutor(workers)
        self.pending: List[Tuple[Path, Future]] = []

    def submit_array(self, path: Union[str, Path], array: np.ndarray) -> None:
        # Copy now: the caller may reuse/donate the buffer before the
        # pool thread encodes it (np.asarray alone would alias it).
        arr = np.array(array, copy=True)
        self.pending.append(
            (Path(path), self.pool.submit(_write_array, Path(path), arr))
        )

    def submit_pil(self, path: Union[str, Path], img: Image.Image) -> None:
        self.pending.append(
            (Path(path), self.pool.submit(_write_image, Path(path), img))
        )

    def submit_call(self, path: Union[str, Path], fn) -> None:
        """Run an arbitrary writer callable in the pool (e.g. compose +
        save a matplotlib figure); ``path`` is for error reporting and
        directory creation."""
        p = Path(path)

        def run():
            p.parent.mkdir(parents=True, exist_ok=True)
            fn()
            return p

        self.pending.append((p, self.pool.submit(run)))

    def close(self) -> List[Tuple[Path, Exception]]:
        """Wait for all writes; returns (path, error) for any failures."""
        errors = []
        for path, fut in self.pending:
            try:
                fut.result()
            except Exception as e:  # noqa: BLE001
                errors.append((path, e))
        self.pool.shutdown()
        self.pending.clear()
        return errors

    def __enter__(self) -> "AsyncWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

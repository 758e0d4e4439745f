"""Image decoding to HWC uint8 arrays."""

from __future__ import annotations

import io
from pathlib import Path
from typing import Union

import numpy as np
from PIL import Image

# The reference's accepted upload/batch extensions
# (process-images.py:1237, backend-process.py:88).
IMAGE_EXTENSIONS = {".tif", ".tiff", ".png", ".jpg", ".jpeg"}


def _to_rgnir_array(img: Image.Image) -> np.ndarray:
    """HWC uint8 with exactly 3 channels (R, G, NIR band contract)."""
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def decode_bytes(data: bytes) -> np.ndarray:
    with Image.open(io.BytesIO(data)) as img:
        img.load()
        return _to_rgnir_array(img)


def decode_file(path: Union[str, Path]) -> np.ndarray:
    with Image.open(path) as img:
        img.load()
        return _to_rgnir_array(img)


def decode_file_fast(path: Union[str, Path]) -> np.ndarray:
    """Native (libtiff/libjpeg/libpng) decode with PIL fallback.

    The native path skips PIL's Image object and mode plumbing and
    releases the GIL for the whole decode; PIL covers whatever it
    rejects (exotic color modes, off-spec files, and ALL non-8-bit
    inputs — libtiff/libpng rescale 16-bit samples where PIL clamps,
    so those are rejected natively and decoded by PIL). Byte-for-byte
    equal to :func:`decode_file` on every input (tested, incl. 16-bit).
    """
    from rgnir_tpu.native import imgio

    if imgio.native_available():
        try:
            return imgio.decode_file(path)
        except OSError:
            pass
    return decode_file(path)

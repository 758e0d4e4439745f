"""L4 host-side IO: async decode pool -> batched device tensors -> encode pool.

The reference decodes/encodes synchronously one image at a time inside
its processing loops (backend-process.py:52, 92-97). Here decode and
encode run in thread pools (PIL releases the GIL in its C codecs), the
loader groups same-shape images into device batches with prefetch, and
writers overlap encoding with device compute — the device never waits
on the host at steady state.
"""

from rgnir_tpu.io.cache import DecodedCache
from rgnir_tpu.io.decode import decode_bytes, decode_file, IMAGE_EXTENSIONS
from rgnir_tpu.io.loader import BatchLoader, LoadedBatch
from rgnir_tpu.io.writer import AsyncWriter, encode_png

__all__ = [
    "decode_bytes",
    "decode_file",
    "DecodedCache",
    "IMAGE_EXTENSIONS",
    "BatchLoader",
    "LoadedBatch",
    "AsyncWriter",
    "encode_png",
]

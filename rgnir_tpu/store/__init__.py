"""L3 storage: image + monitoring-site persistence with hash dedupe.

Mirrors the reference's MongoDB layer (process-images.py:24-396) behind
a backend-neutral interface:

- ``FsImageStore`` — filesystem backend (JSON metadata + blobs); always
  available, used by tests and the CLI by default.
- ``MongoImageStore`` — pymongo backend with the reference's connection
  options (pool size 3, idle 30 s, timeouts 5/10/30 s,
  process-images.py:38-49); import-gated since pymongo may be absent.

Upload semantics shared by both (process-images.py:200-286): 16 MB
pre-check, MD5 dedupe of the raw bytes, decode-validate, LANCZOS
downscale to <=2048 px re-encoded in the original format (PNG fallback)
with a **re-hash of the resized bytes** (process-images.py:252).
"""

from rgnir_tpu.store.base import (
    DuplicateImageError,
    ImageRecord,
    ImageStore,
    SiteRecord,
    StoreError,
    TooLargeError,
    compute_file_hash,
    prepare_upload,
)
from rgnir_tpu.store.fs import FsImageStore

try:  # pragma: no cover - optional dependency
    from rgnir_tpu.store.mongo import MongoImageStore
except ImportError:  # pymongo not installed
    MongoImageStore = None  # type: ignore

__all__ = [
    "ImageStore",
    "ImageRecord",
    "SiteRecord",
    "StoreError",
    "DuplicateImageError",
    "TooLargeError",
    "compute_file_hash",
    "prepare_upload",
    "FsImageStore",
    "MongoImageStore",
]

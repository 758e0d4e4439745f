"""Storage interface + shared upload preparation.

Reference semantics cited per method; see rgnir_tpu.store package doc.
"""

from __future__ import annotations

import abc
import dataclasses
import datetime as _dt
import hashlib
import io
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from rgnir_tpu.config import MAX_DOC_MB, MAX_STORE_DIM, THUMBNAIL_SIZE


class StoreError(Exception):
    """Base class for storage failures."""


class DuplicateImageError(StoreError):
    """Image with the same content hash already stored
    (process-images.py:221-224, 270-273)."""


class TooLargeError(StoreError):
    """File exceeds the 16 MB document cap (process-images.py:204-209)."""


def compute_file_hash(data: bytes) -> str:
    """MD5 of raw bytes — the reference's dedupe identity
    (process-images.py:59-61). MD5 is retained for parity; it is a
    content fingerprint, not a security boundary."""
    return hashlib.md5(data).hexdigest()


@dataclasses.dataclass
class ImageRecord:
    """Stored image metadata (document shape of process-images.py:255-264)."""

    image_id: str
    filename: str
    upload_date: _dt.datetime
    file_size_mb: float
    image_dimensions: Tuple[int, int]  # (width, height) as PIL reports
    file_hash: str
    site_id: Optional[str] = None
    assigned_to_site_date: Optional[_dt.datetime] = None

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["upload_date"] = self.upload_date.isoformat()
        if self.assigned_to_site_date is not None:
            d["assigned_to_site_date"] = self.assigned_to_site_date.isoformat()
        d["image_dimensions"] = list(self.image_dimensions)
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "ImageRecord":
        d = dict(d)
        d["upload_date"] = _dt.datetime.fromisoformat(d["upload_date"])
        if d.get("assigned_to_site_date"):
            d["assigned_to_site_date"] = _dt.datetime.fromisoformat(
                d["assigned_to_site_date"]
            )
        d["image_dimensions"] = tuple(d["image_dimensions"])
        return cls(**d)


@dataclasses.dataclass
class SiteRecord:
    """Monitoring site (document shape of process-images.py:303-332)."""

    site_id: str
    name: str
    description: str = ""
    coordinates: Optional[Dict[str, float]] = None  # {"lat": .., "lng": ..}
    created_date: Optional[_dt.datetime] = None
    last_updated: Optional[_dt.datetime] = None

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        for k in ("created_date", "last_updated"):
            if d[k] is not None:
                d[k] = d[k].isoformat()
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "SiteRecord":
        d = dict(d)
        for k in ("created_date", "last_updated"):
            if d.get(k):
                d[k] = _dt.datetime.fromisoformat(d[k])
        return cls(**d)


@dataclasses.dataclass
class PreparedUpload:
    data: bytes
    file_hash: str
    filename: str
    file_size_mb: float
    dimensions: Tuple[int, int]
    format: str


def prepare_upload(
    filename: str,
    data: bytes,
    max_mb: float = MAX_DOC_MB,
    max_dim: int = MAX_STORE_DIM,
) -> PreparedUpload:
    """Validate + normalize an upload (process-images.py:200-252).

    16 MB pre-check; decode-validate; if the longest side exceeds
    ``max_dim``, LANCZOS-downscale and re-encode in the original format
    (PNG fallback) and re-hash the resized bytes.

    Deliberate deviation: backends dedupe on the returned (post-resize)
    hash. The reference checks the PRE-resize hash against stored
    POST-resize hashes (process-images.py:212-224 vs 252), so
    re-uploading the same oversized file always misses the check and
    stores a duplicate, caught only by a later remove_duplicate_images
    sweep. Hashing one canonical form closes that hole; the stored
    identity (MD5 of the stored bytes) matches the reference exactly.
    """
    size_mb = len(data) / (1024 * 1024)
    if size_mb > max_mb:
        raise TooLargeError(
            f"File too large ({size_mb:.1f} MB > {max_mb:.0f} MB): {filename}"
        )
    try:
        img = Image.open(io.BytesIO(data))
        img.load()
    except Exception as e:
        raise StoreError(f"Cannot decode image {filename}: {e}") from e

    fmt = img.format or "PNG"
    w, h = img.size
    if max(w, h) > max_dim:
        # max(1, ...): extreme panoramic strips (e.g. 5000x1) would
        # otherwise round the short side to zero and crash resize.
        if w >= h:
            new_w, new_h = max_dim, max(1, int(h * (max_dim / w)))
        else:
            new_h, new_w = max_dim, max(1, int(w * (max_dim / h)))
        img = img.resize((new_w, new_h), Image.Resampling.LANCZOS)
        buf = io.BytesIO()
        try:
            img.save(buf, format=fmt)
        except Exception:
            fmt = "PNG"
            buf = io.BytesIO()
            img.save(buf, format=fmt)
        data = buf.getvalue()
        w, h = img.size
    return PreparedUpload(
        data=data,
        file_hash=compute_file_hash(data),
        filename=filename,
        file_size_mb=len(data) / (1024 * 1024),
        dimensions=(w, h),
        format=fmt,
    )


class ImageStore(abc.ABC):
    """Backend-neutral storage API mirroring process-images.py's surface."""

    # --- images ---------------------------------------------------------
    @abc.abstractmethod
    def save_image(self, filename: str, data: bytes) -> ImageRecord:
        """Store an upload (process-images.py:200-286). Raises
        DuplicateImageError / TooLargeError / StoreError."""

    @abc.abstractmethod
    def load_image(
        self, image_id: str, thumbnail: bool = False
    ) -> Tuple[ImageRecord, Image.Image]:
        """Fetch metadata + decoded image (process-images.py:145-198);
        ``thumbnail`` caps at 400x400 LANCZOS (process-images.py:186-189)."""

    @abc.abstractmethod
    def list_images(
        self, page: int = 1, per_page: int = 12, with_total: bool = False
    ) -> Tuple[List[ImageRecord], Optional[int]]:
        """Paginated metadata-only listing, newest first
        (process-images.py:98-143)."""

    @abc.abstractmethod
    def remove_image(self, image_id: str) -> bool:
        """Delete one image (process-images.py:288-300)."""

    @abc.abstractmethod
    def remove_duplicates(self) -> int:
        """Delete all but the first image per content hash; returns the
        number removed (process-images.py:63-96)."""

    # --- sites ----------------------------------------------------------
    @abc.abstractmethod
    def create_site(
        self,
        name: str,
        description: str = "",
        coordinates: Optional[Dict[str, float]] = None,
    ) -> SiteRecord:
        """Create a uniquely-named monitoring site
        (process-images.py:303-332)."""

    @abc.abstractmethod
    def list_sites(self) -> List[SiteRecord]:
        """All sites sorted by name ascending (process-images.py:334-347)."""

    @abc.abstractmethod
    def assign_image_to_site(self, image_id: str, site_id: str) -> bool:
        """Tag an image with a site + bump site.last_updated
        (process-images.py:349-377)."""

    @abc.abstractmethod
    def site_images(self, site_id: str) -> List[ImageRecord]:
        """Site's images sorted by upload_date ascending — time-series
        order (process-images.py:379-396)."""

    # --- shared helpers -------------------------------------------------
    def clear_all_images(self) -> int:
        """Delete every stored image (the UI's two-step 'Delete All',
        process-images.py:1273-1293). Returns the number removed."""
        removed = 0
        while True:
            page, _ = self.list_images(page=1, per_page=100)
            if not page:
                return removed
            pass_removed = 0
            for rec in page:
                if self.remove_image(rec.image_id):
                    removed += 1
                    pass_removed += 1
            if pass_removed == 0:
                # Nothing on the page could be removed — bail rather
                # than spin forever on the same stuck listing.
                return removed

    def load_array(self, image_id: str) -> Tuple[ImageRecord, np.ndarray]:
        """Metadata + HWC uint8 array (the 'array' field of
        process-images.py:191-193)."""
        rec, img = self.load_image(image_id, thumbnail=False)
        return rec, np.asarray(img)

    @staticmethod
    def _thumbnail(img: Image.Image) -> Image.Image:
        img = img.copy()
        img.thumbnail(THUMBNAIL_SIZE, Image.Resampling.LANCZOS)
        return img

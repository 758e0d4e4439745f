"""MongoDB storage backend (pymongo; import-gated at package level).

Mirrors the reference's connection handling (process-images.py:24-57):
URI from ``MONGODB_URI`` env (or explicit), ``maxPoolSize=3`` /
``maxIdleTimeMS=30000`` appended to the URI, server-selection /
connect / socket timeouts of 5 s / 10 s / 30 s, and a ``ping``
health check on connect. Collections: ``images`` (documents with
``metadata`` subdoc + ``image_data`` binary, process-images.py:255-264)
and ``monitoring_sites`` (process-images.py:303-332).

Exercised two ways: the shared upload/validation logic through
rgnir_tpu.store.base, and the full backend (error taxonomy, aggregation
dedupe, two-phase fetch, projections) through the vendored
pymongo-compatible fake (rgnir_tpu.testing.fake_mongo) in
tests/test_store.py — no MongoDB server required.
"""

from __future__ import annotations

import datetime as _dt
import io
import os
from typing import Dict, List, Optional, Tuple

from PIL import Image

import pymongo
from bson import Binary, ObjectId

from rgnir_tpu.config import StoreConfig
from rgnir_tpu.store.base import (
    DuplicateImageError,
    ImageRecord,
    ImageStore,
    SiteRecord,
    StoreError,
    prepare_upload,
)


def _with_pool_options(uri: str, cfg: StoreConfig) -> str:
    sep = "&" if "?" in uri else "?"
    return (
        f"{uri}{sep}maxPoolSize={cfg.max_pool_size}"
        f"&maxIdleTimeMS={cfg.max_idle_time_ms}"
    )


def _rec_from_doc(doc: dict) -> ImageRecord:
    md = doc.get("metadata", {})
    return ImageRecord(
        image_id=str(doc["_id"]),
        filename=md.get("filename", ""),
        upload_date=md.get("upload_date", _dt.datetime.min),
        file_size_mb=md.get("file_size_mb", 0.0),
        image_dimensions=tuple(md.get("image_dimensions", (0, 0))),
        file_hash=md.get("file_hash", ""),
        site_id=md.get("site_id"),
        assigned_to_site_date=md.get("assigned_to_site_date"),
    )


class MongoImageStore(ImageStore):
    def __init__(
        self,
        uri: Optional[str] = None,
        cfg: StoreConfig = StoreConfig(),
        database: str = "rgnir",
    ):
        uri = uri or cfg.mongo_uri or os.environ.get("MONGODB_URI")
        if not uri:
            raise StoreError("MONGODB_URI is not configured")
        self.client = pymongo.MongoClient(
            _with_pool_options(uri, cfg),
            serverSelectionTimeoutMS=cfg.server_selection_timeout_ms,
            connectTimeoutMS=cfg.connect_timeout_ms,
            socketTimeoutMS=cfg.socket_timeout_ms,
        )
        self.client.admin.command("ping")  # health check
        self.db = self.client[database]
        self.images = self.db["images"]
        self.sites = self.db["monitoring_sites"]

    # --- images ---------------------------------------------------------
    def save_image(self, filename: str, data: bytes) -> ImageRecord:
        prep = prepare_upload(filename, data)
        if self.images.find_one({"metadata.file_hash": prep.file_hash}):
            raise DuplicateImageError(
                f"Image already exists (hash {prep.file_hash}): {filename}"
            )
        doc = {
            "metadata": {
                "filename": prep.filename,
                "upload_date": _dt.datetime.now(),
                "file_size_mb": prep.file_size_mb,
                "image_dimensions": list(prep.dimensions),
                "file_hash": prep.file_hash,
            },
            "image_data": Binary(prep.data),
        }
        try:
            result = self.images.insert_one(doc)
        except pymongo.errors.DuplicateKeyError as e:
            raise DuplicateImageError(str(e)) from e
        except pymongo.errors.DocumentTooLarge as e:
            raise StoreError(f"Document too large: {filename}") from e
        doc["_id"] = result.inserted_id
        return _rec_from_doc(doc)

    def load_image(
        self, image_id: str, thumbnail: bool = False
    ) -> Tuple[ImageRecord, Image.Image]:
        oid = self._oid(image_id)
        # Two-phase fetch as in the reference (process-images.py:160-179):
        # metadata projection first, then the binary payload.
        meta_doc = self.images.find_one({"_id": oid}, {"metadata": 1})
        if meta_doc is None:
            raise StoreError(f"No image with id {image_id}")
        data_doc = self.images.find_one({"_id": oid}, {"image_data": 1})
        if data_doc is None or "image_data" not in data_doc:
            # Concurrently deleted between the two fetches.
            raise StoreError(f"No image data for id {image_id}")
        img = Image.open(io.BytesIO(data_doc["image_data"]))
        img.load()
        if thumbnail:
            img = self._thumbnail(img)
        return _rec_from_doc(meta_doc), img

    def list_images(
        self, page: int = 1, per_page: int = 12, with_total: bool = False
    ) -> Tuple[List[ImageRecord], Optional[int]]:
        total = self.images.count_documents({}) if with_total else None
        cursor = (
            self.images.find({}, {"metadata": 1, "_id": 1})
            .sort("metadata.upload_date", pymongo.DESCENDING)
            .skip((page - 1) * per_page)
            .limit(per_page)
        )
        return [_rec_from_doc(d) for d in cursor], total

    @staticmethod
    def _oid(value: str) -> ObjectId:
        """Parse an id, mapping malformed input into the StoreError
        taxonomy callers handle (bson raises InvalidId otherwise)."""
        try:
            return ObjectId(value)
        except Exception as e:  # bson.errors.InvalidId and kin
            raise StoreError(f"Invalid image/site id {value!r}") from e

    def remove_image(self, image_id: str) -> bool:
        result = self.images.delete_one({"_id": self._oid(image_id)})
        return result.deleted_count > 0

    def remove_duplicates(self) -> int:
        # Aggregation-group by hash, keep the EARLIEST upload, delete
        # the rest (process-images.py:63-96). The explicit $sort makes
        # "first" deterministic — without it $push accumulates in
        # collection natural order, which MongoDB does not guarantee to
        # be insertion order, and a later upload (possibly carrying a
        # site assignment) could survive instead of the original. The
        # fs backend sorts by upload_date the same way.
        pipeline = [
            {"$sort": {"metadata.upload_date": 1}},
            {
                "$group": {
                    "_id": "$metadata.file_hash",
                    "ids": {"$push": "$_id"},
                    "count": {"$sum": 1},
                }
            },
            {"$match": {"count": {"$gt": 1}}},
        ]
        removed = 0
        for group in self.images.aggregate(pipeline):
            extra_ids = group["ids"][1:]
            result = self.images.delete_many({"_id": {"$in": extra_ids}})
            removed += result.deleted_count
        return removed

    # --- sites ----------------------------------------------------------
    def create_site(
        self,
        name: str,
        description: str = "",
        coordinates: Optional[Dict[str, float]] = None,
    ) -> SiteRecord:
        if self.sites.find_one({"name": name}):
            raise StoreError(f"A site named {name!r} already exists")
        now = _dt.datetime.now()
        doc = {
            "name": name,
            "description": description,
            "coordinates": coordinates,
            "created_date": now,
            "last_updated": now,
        }
        result = self.sites.insert_one(doc)
        return SiteRecord(
            site_id=str(result.inserted_id),
            name=name,
            description=description,
            coordinates=coordinates,
            created_date=now,
            last_updated=now,
        )

    def list_sites(self) -> List[SiteRecord]:
        out = []
        for doc in self.sites.find({}).sort("name", pymongo.ASCENDING):
            out.append(
                SiteRecord(
                    site_id=str(doc["_id"]),
                    name=doc.get("name", ""),
                    description=doc.get("description", ""),
                    coordinates=doc.get("coordinates"),
                    created_date=doc.get("created_date"),
                    last_updated=doc.get("last_updated"),
                )
            )
        return out

    def assign_image_to_site(self, image_id: str, site_id: str) -> bool:
        result = self.images.update_one(
            {"_id": self._oid(image_id)},
            {
                "$set": {
                    "metadata.site_id": site_id,
                    "metadata.assigned_to_site_date": _dt.datetime.now(),
                }
            },
        )
        if result.matched_count == 0:
            return False
        self.sites.update_one(
            {"_id": self._oid(site_id)},
            {"$set": {"last_updated": _dt.datetime.now()}},
        )
        return True

    def site_images(self, site_id: str) -> List[ImageRecord]:
        cursor = (
            self.images.find({"metadata.site_id": site_id}, {"metadata": 1})
            .sort("metadata.upload_date", pymongo.ASCENDING)
        )
        return [_rec_from_doc(d) for d in cursor]

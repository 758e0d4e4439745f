"""Storage layer tests (reference semantics: process-images.py:24-396).

The contract suite runs against BOTH backends: the filesystem store and
the real MongoImageStore code driven by the vendored in-memory pymongo
fake (rgnir_tpu.testing.fake_mongo) — exercising the reference's error
taxonomy (E11000 duplicate key, doc-too-large, process-images.py:267-278),
the $group-by-hash aggregation dedupe (63-96), and the two-phase
metadata/blob fetch (160-179).
"""

import datetime
import io

import numpy as np
import pytest
from PIL import Image

from rgnir_tpu.store import (
    DuplicateImageError,
    FsImageStore,
    StoreError,
    TooLargeError,
    compute_file_hash,
    prepare_upload,
)
from rgnir_tpu.testing import fake_mongo

fake_mongo.install()

from rgnir_tpu.store.mongo import MongoImageStore  # noqa: E402


def _png_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(params=["fs", "mongo"])
def store(request, tmp_path):
    if request.param == "fs":
        return FsImageStore(tmp_path / "store")
    fake_mongo.reset()
    return MongoImageStore(uri="mongodb://fake-test")


@pytest.fixture
def png(rng):
    return _png_bytes(rng.integers(0, 256, (64, 48, 3), dtype=np.uint8))


class TestPrepareUpload:
    def test_small_image_passthrough(self, png):
        prep = prepare_upload("a.png", png)
        assert prep.file_hash == compute_file_hash(png)
        assert prep.dimensions == (48, 64)  # PIL (w, h)

    def test_large_image_downscaled_and_rehashed(self, rng):
        big = _png_bytes(rng.integers(0, 256, (3000, 1500, 3), dtype=np.uint8))
        prep = prepare_upload("big.png", big, max_dim=2048)
        # longest side capped at 2048, aspect kept via int() truncation
        # (process-images.py:235-243)
        assert prep.dimensions == (int(1500 * (2048 / 3000)), 2048)
        assert prep.file_hash != compute_file_hash(big)  # re-hash of resized

    def test_too_large_rejected(self):
        with pytest.raises(TooLargeError):
            prepare_upload("x.bin", b"\0" * (17 * 1024 * 1024))

    def test_oversized_reupload_deduped(self, tmp_path, rng):
        """Re-uploading the same >max_dim file must be rejected — the
        deliberate fix over the reference, whose pre-resize hash check
        never matches stored post-resize hashes
        (process-images.py:212-224 vs 252)."""
        from rgnir_tpu.store.base import DuplicateImageError
        from rgnir_tpu.store.fs import FsImageStore

        big = _png_bytes(
            rng.integers(0, 256, (2500, 900, 3), dtype=np.uint8)
        )
        store = FsImageStore(tmp_path / "s")
        store.save_image("big.png", big)
        with pytest.raises(DuplicateImageError):
            store.save_image("big_again.png", big)

    def test_extreme_aspect_ratio_clamped(self, rng):
        """A 5000x1 strip must downscale to a >=1px short side, not
        crash resize with a zero dimension."""
        strip = _png_bytes(rng.integers(0, 256, (1, 5000, 3), dtype=np.uint8))
        prep = prepare_upload("strip.png", strip, max_dim=2048)
        assert prep.dimensions == (2048, 1)

    def test_corrupt_site_file_skipped(self, tmp_path, rng):
        from rgnir_tpu.store.fs import FsImageStore

        store = FsImageStore(tmp_path / "s")
        store.create_site("Field A")
        (tmp_path / "s" / "sites" / "junk.json").write_text("{not json")
        assert [s.name for s in store.list_sites()] == ["Field A"]

    def test_garbage_rejected(self):
        with pytest.raises(StoreError):
            prepare_upload("bad.png", b"not an image at all")


class TestStoreContract:
    """Backend-neutral behavior, run against fs AND mongo-on-fake."""

    def test_save_load_roundtrip(self, store, png):
        rec = store.save_image("field.png", png)
        got, img = store.load_image(rec.image_id)
        assert got.filename == "field.png"
        assert got.file_hash == rec.file_hash
        assert np.asarray(img).shape == (64, 48, 3)

    def test_duplicate_rejected(self, store, png):
        store.save_image("a.png", png)
        with pytest.raises(DuplicateImageError):
            store.save_image("b.png", png)  # same content, new name

    def test_thumbnail(self, store, rng):
        big = _png_bytes(rng.integers(0, 256, (800, 600, 3), dtype=np.uint8))
        rec = store.save_image("t.png", big)
        _, thumb = store.load_image(rec.image_id, thumbnail=True)
        assert max(thumb.size) <= 400  # process-images.py:186-189

    def test_pagination_newest_first(self, store, rng):
        ids = []
        for i in range(5):
            data = _png_bytes(
                rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            )
            ids.append(store.save_image(f"img{i}.png", data).image_id)
        page1, total = store.list_images(page=1, per_page=2, with_total=True)
        assert total == 5
        assert len(page1) == 2
        # newest first (upload_date desc, process-images.py:130)
        assert page1[0].upload_date >= page1[1].upload_date
        page3, _ = store.list_images(page=3, per_page=2)
        assert len(page3) == 1

    def test_remove(self, store, png):
        r1 = store.save_image("a.png", png)
        assert store.remove_image(r1.image_id)
        assert not store.remove_image(r1.image_id)

    def test_clear_all_images(self, store, rng):
        for i in range(7):
            data = _png_bytes(
                rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
            )
            store.save_image(f"c{i}.png", data)
        assert store.clear_all_images() == 7
        page, total = store.list_images(with_total=True)
        assert page == [] and total == 0

    def test_sites_flow(self, store, png):
        site = store.create_site("Field A", "test site", {"lat": 1.0, "lng": 2.0})
        with pytest.raises(Exception):
            store.create_site("Field A")  # unique names
        rec = store.save_image("x.png", png)
        assert store.assign_image_to_site(rec.image_id, site.site_id)
        imgs = store.site_images(site.site_id)
        assert [r.image_id for r in imgs] == [rec.image_id]
        sites = store.list_sites()
        assert sites[0].name == "Field A"
        assert sites[0].last_updated >= site.created_date

    def test_site_images_time_series_order(self, store, rng):
        """upload_date ASCENDING — oldest first (process-images.py:379-396)."""
        site = store.create_site("TS")
        recs = []
        for i in range(3):
            data = _png_bytes(
                rng.integers(0, 256, (10, 10, 3), dtype=np.uint8)
            )
            rec = store.save_image(f"ts{i}.png", data)
            store.assign_image_to_site(rec.image_id, site.site_id)
            recs.append(rec)
        got = store.site_images(site.site_id)
        dates = [r.upload_date for r in got]
        assert dates == sorted(dates)
        assert all(r.site_id == site.site_id for r in got)
        assert all(r.assigned_to_site_date is not None for r in got)


class TestFsStore:
    def test_dedupe_via_direct_records(self, tmp_path, rng):
        store = FsImageStore(tmp_path / "store")
        png = _png_bytes(rng.integers(0, 256, (64, 48, 3), dtype=np.uint8))
        r2 = store.save_image("a2.png", png)
        import json

        meta = store.root / "images" / f"{r2.image_id}.json"
        dup = json.loads(meta.read_text())
        dup["image_id"] = "dupdupdup"
        (store.root / "images" / "dupdupdup.json").write_text(json.dumps(dup))
        (store.root / "images" / "dupdupdup.blob").write_bytes(png)
        assert store.remove_duplicates() == 1
        remaining, _ = store.list_images(per_page=100)
        assert len(remaining) == 1


class TestMongoStore:
    """Mongo-specific behavior driven through the fake client."""

    @pytest.fixture
    def mstore(self):
        fake_mongo.reset()
        return MongoImageStore(uri="mongodb://fake-test")

    def test_connection_options(self, mstore):
        # Pool options appended to the URI + reference timeouts
        # (process-images.py:38-49).
        assert "maxPoolSize=3" in mstore.client.uri
        assert "maxIdleTimeMS=30000" in mstore.client.uri
        assert mstore.client.options["serverSelectionTimeoutMS"] == 5000
        assert mstore.client.options["connectTimeoutMS"] == 10000
        assert mstore.client.options["socketTimeoutMS"] == 30000

    def test_missing_uri_raises(self, monkeypatch):
        monkeypatch.delenv("MONGODB_URI", raising=False)
        with pytest.raises(StoreError):
            MongoImageStore()

    def test_aggregation_dedupe_keeps_first(self, mstore, rng):
        """$group-by-hash dedupe keeps the first stored copy
        (process-images.py:63-96)."""
        png = _png_bytes(rng.integers(0, 256, (20, 20, 3), dtype=np.uint8))
        first = mstore.save_image("orig.png", png)
        # Two byte-identical copies inserted behind the store's back
        # (bypassing the save-time hash pre-check).
        prep = prepare_upload("copy.png", png)
        for i in range(2):
            mstore.images.insert_one({
                "metadata": {
                    "filename": f"copy{i}.png",
                    "upload_date": datetime.datetime.now(),
                    "file_hash": prep.file_hash,
                },
                "image_data": fake_mongo.Binary(prep.data),
            })
        assert mstore.remove_duplicates() == 2
        remaining, _ = mstore.list_images(per_page=100)
        assert [r.image_id for r in remaining] == [first.image_id]

    def test_dedupe_keeps_earliest_upload_date(self, mstore, rng):
        """The $sort stage makes 'first' mean earliest upload_date even
        when collection order disagrees — the surviving doc is the one
        that may carry a site assignment."""
        png = _png_bytes(rng.integers(0, 256, (20, 20, 3), dtype=np.uint8))
        prep = prepare_upload("a.png", png)
        now = datetime.datetime.now()
        # Inserted newest-FIRST in collection order:
        for i, age_days in enumerate((0, 3, 7)):
            mstore.images.insert_one({
                "metadata": {
                    "filename": f"c{i}.png",
                    "upload_date": now - datetime.timedelta(days=age_days),
                    "file_hash": prep.file_hash,
                    **({"site_id": "site-x"} if age_days == 7 else {}),
                },
                "image_data": fake_mongo.Binary(prep.data),
            })
        assert mstore.remove_duplicates() == 2
        remaining, _ = mstore.list_images(per_page=100)
        assert len(remaining) == 1
        assert remaining[0].site_id == "site-x"  # oldest survived

    def test_invalid_id_maps_to_store_error(self, mstore):
        with pytest.raises(StoreError, match="Invalid"):
            mstore.load_image("not-a-valid-oid")
        with pytest.raises(StoreError, match="Invalid"):
            mstore.remove_image("xyz")

    def test_duplicate_key_error_translated(self, mstore, png, monkeypatch):
        """A server-side E11000 surfaces as DuplicateImageError
        (process-images.py:270-273)."""
        def raise_dup(doc):
            raise fake_mongo.DuplicateKeyError("E11000 duplicate key error")

        monkeypatch.setattr(mstore.images, "insert_one", raise_dup)
        with pytest.raises(DuplicateImageError):
            mstore.save_image("x.png", png)

    def test_document_too_large_translated(self, mstore, png, monkeypatch):
        """A server-side doc-too-large surfaces as StoreError
        (process-images.py:274-278)."""
        def raise_big(doc):
            raise fake_mongo.DocumentTooLarge("too big")

        monkeypatch.setattr(mstore.images, "insert_one", raise_big)
        with pytest.raises(StoreError, match="too large"):
            mstore.save_image("x.png", png)

    def test_two_phase_fetch_projections(self, mstore, png):
        """Metadata fetch must not pull the blob, and vice versa
        (process-images.py:160-179)."""
        rec = mstore.save_image("p.png", png)
        calls = []
        real_find_one = mstore.images.find_one

        def spy(filt=None, projection=None):
            calls.append(projection)
            return real_find_one(filt, projection)

        mstore.images.find_one = spy
        mstore.load_image(rec.image_id)
        assert calls == [{"metadata": 1}, {"image_data": 1}]

    def test_load_missing_raises(self, mstore):
        with pytest.raises(StoreError):
            mstore.load_image("0" * 24)

    def test_shared_server_across_clients(self, png):
        fake_mongo.reset()
        a = MongoImageStore(uri="mongodb://fake-shared")
        rec = a.save_image("s.png", png)
        b = MongoImageStore(uri="mongodb://fake-shared")
        got, _ = b.load_image(rec.image_id)
        assert got.file_hash == rec.file_hash

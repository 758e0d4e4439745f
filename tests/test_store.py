"""Storage layer tests (reference semantics: process-images.py:24-396)."""

import io

import numpy as np
import pytest
from PIL import Image

from rgnir_tpu.store import (
    DuplicateImageError,
    FsImageStore,
    TooLargeError,
    compute_file_hash,
    prepare_upload,
)


def _png_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture
def store(tmp_path):
    return FsImageStore(tmp_path / "store")


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

    def test_garbage_rejected(self):
        from rgnir_tpu.store import StoreError

        with pytest.raises(StoreError):
            prepare_upload("bad.png", b"not an image at all")


class TestFsStore:
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

    def test_remove_and_dedupe(self, store, rng, png):
        r1 = store.save_image("a.png", png)
        assert store.remove_image(r1.image_id)
        assert not store.remove_image(r1.image_id)
        # dedupe: bypass save-time check by writing records directly
        r2 = store.save_image("a2.png", png)
        import json
        from pathlib import Path

        meta = store.root / "images" / f"{r2.image_id}.json"
        dup = json.loads(meta.read_text())
        dup["image_id"] = "dupdupdup"
        (store.root / "images" / "dupdupdup.json").write_text(json.dumps(dup))
        (store.root / "images" / "dupdupdup.blob").write_bytes(png)
        assert store.remove_duplicates() == 1
        remaining, _ = store.list_images(per_page=100)
        assert len(remaining) == 1

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

"""Real-service integration tests — skip-gated on the actual deps.

The suite's fakes (testing/fake_mongo, testing/fake_streamlit) install
themselves ONLY when the real package is missing, so all contract tests
already bind the real modules when present. These tests go further:
they exercise the two environment-gated partials from the round-3
coverage table against the REAL services —

- ``MongoImageStore`` against a live mongod (the reference always talks
  to a real server, process-images.py:24-57), and
- ``app/streamlit_app.py`` under real Streamlit's official headless
  harness (``streamlit.testing.v1.AppTest``; the reference runs under
  ``streamlit run``, README.md:75-77, process-images.py:1198-1612).

Neither streamlit nor pymongo/mongod exists in the build environment,
so here they skip; on a machine with the deps they run with NO code
change. Point ``RGNIR_TEST_MONGODB_URI`` at a disposable server (the
test writes to and then DROPS a uniquely named database).
"""

from __future__ import annotations

import io
import os
import sys
import uuid

import numpy as np
import pytest
from PIL import Image


def _png_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _real_module(name: str):
    """Import ``name`` and skip if it is absent OR it is one of the
    suite's fakes (which register under the real name)."""
    mod = pytest.importorskip(name)
    if getattr(mod, "__fake__", False):
        pytest.skip(f"only the vendored fake {name} is available")
    return mod


# ----------------------------------------------------------------- mongo


@pytest.fixture
def real_mongo_store():
    _real_module("pymongo")
    uri = os.environ.get("RGNIR_TEST_MONGODB_URI", "mongodb://localhost:27017")
    from rgnir_tpu.store import StoreError
    from rgnir_tpu.store.mongo import MongoImageStore

    db = f"rgnir_test_{uuid.uuid4().hex[:12]}"
    try:
        store = MongoImageStore(uri=uri, database=db)
    except StoreError as e:  # no server listening: env-gated skip
        pytest.skip(f"no reachable mongod at {uri}: {e}")
    yield store
    store.client.drop_database(db)
    store.client.close()


class TestRealMongo:
    """The full storage contract against a live server (the same
    assertions test_store.py pins on the fake — upload/dedupe/list/
    fetch/remove/sites, process-images.py:59-396)."""

    def test_upload_dedupe_fetch_remove(self, real_mongo_store, rng):
        store = real_mongo_store
        png = _png_bytes(rng.integers(0, 256, (64, 48, 3), dtype=np.uint8))
        rec = store.save_image("a.png", png)
        assert rec.file_hash
        from rgnir_tpu.store import DuplicateImageError

        with pytest.raises(DuplicateImageError):
            store.save_image("b.png", png)  # same bytes, MD5 dedupe
        _, total = store.list_images(with_total=True)
        assert total == 1
        got, img = store.load_image(rec.image_id)
        assert got.file_hash == rec.file_hash
        assert img.size == (48, 64)  # PIL (w, h)
        _, thumb = store.load_image(rec.image_id, thumbnail=True)
        assert max(thumb.size) <= 400  # (400,400) LANCZOS cap
        assert store.remove_image(rec.image_id)
        _, total = store.list_images(with_total=True)
        assert total == 0

    def test_remove_duplicates_aggregation(self, real_mongo_store, rng):
        store = real_mongo_store
        png = _png_bytes(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
        store.save_image("a.png", png)
        # Force a duplicate document past the pre-insert dedupe, the
        # way legacy data would contain one.
        doc = store.images.find_one({})
        doc.pop("_id")
        store.images.insert_one(doc)
        assert store.remove_duplicates() == 1
        _, total = store.list_images(with_total=True)
        assert total == 1

    def test_sites_flow(self, real_mongo_store, rng):
        store = real_mongo_store
        site = store.create_site(
            "field-7", "north plot", {"lat": 1.0, "lng": 2.0}
        )
        assert [s.name for s in store.list_sites()] == ["field-7"]
        png = _png_bytes(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
        rec = store.save_image("a.png", png)
        assert store.assign_image_to_site(rec.image_id, site.site_id)
        imgs = store.site_images(site.site_id)
        assert [i.image_id for i in imgs] == [rec.image_id]


# ------------------------------------------------------------- streamlit


class TestRealStreamlit:
    def test_app_runs_under_apptest(self, tmp_path, monkeypatch):
        _real_module("streamlit")
        from streamlit.testing.v1 import AppTest

        monkeypatch.setenv("RGNIR_STORE_ROOT", str(tmp_path / "store"))
        monkeypatch.delenv("MONGODB_URI", raising=False)
        # The app module must bind the REAL streamlit, not a fake a
        # sibling test installed earlier in this process.
        sys.modules.pop("rgnir_tpu.app.streamlit_app", None)

        def script():
            from rgnir_tpu.app import streamlit_app

            streamlit_app.main()

        at = AppTest.from_function(script, default_timeout=120)
        at.run()
        assert not at.exception
        # Two tabs, reference parity (process-images.py:1203).
        labels = [t.label for t in at.tabs]
        assert labels == ["Image Analysis", "Time Series Monitoring"]

    def test_upload_and_gallery_under_apptest(self, tmp_path, monkeypatch):
        _real_module("streamlit")
        from streamlit.testing.v1 import AppTest

        monkeypatch.setenv("RGNIR_STORE_ROOT", str(tmp_path / "store"))
        monkeypatch.delenv("MONGODB_URI", raising=False)
        sys.modules.pop("rgnir_tpu.app.streamlit_app", None)

        # AppTest cannot drive st.file_uploader yet (no setter in the
        # official harness) — seed the store directly and check the
        # gallery renders it.
        from rgnir_tpu.store import FsImageStore

        store = FsImageStore(tmp_path / "store")
        rng = np.random.default_rng(7)
        store.save_image(
            _png_bytes(rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)),
            "seeded.png",
        )

        def script():
            from rgnir_tpu.app import streamlit_app

            streamlit_app.main()

        at = AppTest.from_function(script, default_timeout=120)
        at.run()
        assert not at.exception
        body = " ".join(str(m.value) for m in at.markdown)
        assert "seeded.png" in body or any(
            "seeded" in str(c) for c in at.caption
        )

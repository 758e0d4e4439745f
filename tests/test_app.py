"""Headless Streamlit-app tests (reference UI: process-images.py:993-1612).

Drives rgnir_tpu.app.streamlit_app through the fake_streamlit
AppHarness: upload -> gallery -> select -> comparison -> ZIP download,
store management (dedupe + two-step delete-all), and the sites /
time-series / change-detection tab including the coordinates-opt-in
contract (process-images.py:1008-1023).
"""

import io
import zipfile

import numpy as np
import pytest
from PIL import Image

from rgnir_tpu.testing import fake_streamlit
from rgnir_tpu.testing.fake_streamlit import AppHarness, UploadedFile

fake_streamlit.install()

from rgnir_tpu.app import streamlit_app  # noqa: E402
from rgnir_tpu.store import FsImageStore  # noqa: E402


def _png_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture
def app_env(tmp_path, monkeypatch):
    """Point the app's store at a temp dir; return (harness, store)."""
    monkeypatch.setenv("RGNIR_STORE_ROOT", str(tmp_path / "store"))
    monkeypatch.delenv("MONGODB_URI", raising=False)
    harness = AppHarness(streamlit_app.main)
    store = FsImageStore(tmp_path / "store")
    return harness, store


def _uploads(rng, n=2, h=48, w=64):
    return [
        UploadedFile(
            f"frame_{i}.png",
            _png_bytes(rng.integers(0, 256, (h, w, 3), dtype=np.uint8)),
        )
        for i in range(n)
    ]


class TestUploadAndGallery:
    def test_upload_stores_and_dedupes_batch(self, app_env, rng):
        h, store = app_env
        files = _uploads(rng, 2)
        dup = UploadedFile("copy_of_0.png", files[0].getvalue())
        h.set("Upload RGNir images", files + [dup])
        h.run()
        # Within-batch hash dedupe (process-images.py:1246-1252): the
        # byte-identical third file is skipped.
        _, total = store.list_images(with_total=True)
        assert total == 2
        # After the post-store rerun the uploader re-sends the files and
        # the store-level dedupe reports them as already stored.
        assert any("Already stored" in str(v) for v in h.values("info"))

    def test_gallery_thumbnails_and_remove(self, app_env, rng):
        h, store = app_env
        h.set("Upload RGNir images", _uploads(rng, 3))
        h.run()
        assert len(h.values("image")) == 3  # one thumbnail per record
        recs, _ = store.list_images()
        h.set("Upload RGNir images", [])
        h.click(f"rm_{recs[0].image_id}")
        h.run()
        _, total = store.list_images(with_total=True)
        assert total == 2
        assert len(h.values("image")) == 2


class TestManagement:
    def test_delete_all_is_two_step(self, app_env, rng):
        h, store = app_env
        h.set("Upload RGNir images", _uploads(rng, 2))
        h.run()
        h.set("Upload RGNir images", [])
        # Step 1 arms the confirmation; nothing deleted yet.
        h.click("Delete ALL images")
        h.run()
        _, total = store.list_images(with_total=True)
        assert total == 2
        assert any("permanently deletes" in str(v) for v in h.values("warning"))
        # Step 2 deletes.
        h.click("Yes, really delete everything")
        h.run()
        _, total = store.list_images(with_total=True)
        assert total == 0

    def test_remove_duplicates_button(self, app_env, rng):
        h, store = app_env
        h.set("Upload RGNir images", _uploads(rng, 1))
        h.run()
        h.set("Upload RGNir images", [])
        h.click("Remove duplicate images")
        h.run()
        assert any("Removed 0 duplicates" in str(v) for v in h.values("success"))


class TestComparison:
    def test_compare_selected_and_zip(self, app_env, rng):
        h, store = app_env
        h.set("Upload RGNir images", _uploads(rng, 2))
        h.run()
        recs, _ = store.list_images()
        for rec in recs:
            h.set(f"sel_{rec.image_id}", True)
        h.set("Upload RGNir images", [])
        h.set("Indices", ["NDVI", "NDWI"])
        h.click("Generate Comparison Analysis")
        h.run()
        subheaders = [str(v) for v in h.values("subheader")]
        assert "Original Images" in subheaders
        assert "White Balanced" in subheaders
        assert "NDVI" in subheaders and "NDWI" in subheaders
        # Per-image stat tiles (3-decimal metrics, process-images.py:1565)
        metrics = h.by_type("metric")
        assert any(m["label"].startswith("Mean") for m in metrics)
        # ZIP download with wb + per-index visualizations
        # (process-images.py:567-617)
        downloads = h.by_type("download_button")
        zips = [d for d in downloads if d["file_name"] == "processed_images.zip"]
        assert len(zips) == 1
        names = zipfile.ZipFile(io.BytesIO(zips[0]["value"])).namelist()
        assert "white_balanced.png" in names
        assert "NDVI_visualization.png" in names
        assert "NDWI_visualization.png" in names

    def test_remove_selected_then_compare(self, app_env, rng):
        """Removing a SELECTED image must drop it from the selection;
        a later comparison must not try to load the deleted id
        (regression: stale selection crashed with StoreError)."""
        h, store = app_env
        h.set("Upload RGNir images", _uploads(rng, 2))
        h.run()
        recs, _ = store.list_images()
        for rec in recs:
            h.set(f"sel_{rec.image_id}", True)
        h.set("Upload RGNir images", [])
        h.run()  # selection registered
        h.click(f"rm_{recs[0].image_id}")
        h.run()
        h.set("Indices", ["NDVI"])
        h.click("Generate Comparison Analysis")
        h.run()  # must not raise
        subheaders = [str(v) for v in h.values("subheader")]
        assert "NDVI" in subheaders

    def test_no_selection_prompts(self, app_env, rng):
        h, _ = app_env
        h.run()
        assert any("Select images" in str(v) for v in h.values("info"))


class TestTimeSeriesTab:
    def test_site_without_coordinates_stores_none(self, app_env):
        """Coordinates are opt-in; unchecked -> None
        (process-images.py:1008-1023)."""
        h, store = app_env
        h.set("Site Name", "Field A")
        h.set("Description (optional)", "north field")
        h.click("Create Site")
        h.run()
        sites = store.list_sites()
        assert [s.name for s in sites] == ["Field A"]
        assert sites[0].coordinates is None

    def test_site_with_coordinates(self, app_env):
        h, store = app_env
        h.set("Site Name", "Field B")
        h.set("Include Coordinates", True)
        h.set("Latitude", 46.5)
        h.set("Longitude", 6.6)
        h.click("Create Site")
        h.run()
        (site,) = store.list_sites()
        assert site.coordinates == {"lat": 46.5, "lng": 6.6}

    def test_empty_name_errors(self, app_env):
        h, store = app_env
        h.click("Create Site")
        h.run()
        assert "Site name is required" in [str(v) for v in h.values("error")]
        assert store.list_sites() == []

    def test_assign_and_generate_time_series(self, app_env, rng):
        h, store = app_env
        h.set("Upload RGNir images", _uploads(rng, 3, h=40, w=56))
        h.run()
        h.set("Upload RGNir images", [])
        h.set("Site Name", "TS")
        h.click("Create Site")
        h.run()
        (site,) = store.list_sites()
        # Assign all unassigned images via the multiselect.
        h.unset("Site Name")
        h.set("Assign images to this site", lambda options: options)
        h.click("Assign")
        h.run()
        assert len(store.site_images(site.site_id)) == 3
        # Generate: TS plot + stats table + first-vs-last change report.
        h.set("Assign images to this site", [])
        h.set("Index", "NDVI")
        h.click("Generate Time Series Analysis")
        h.run()
        assert len(h.values("dataframe")) == 1
        assert "Change Detection (first vs last)" in [
            str(v) for v in h.values("subheader")
        ]
        downloads = h.by_type("download_button")
        change = [d for d in downloads
                  if d["file_name"].startswith("change_report_NDVI_")]
        assert len(change) == 1
        Image.open(io.BytesIO(change[0]["value"]))  # a valid PNG

    def test_too_few_images_warns(self, app_env, rng):
        h, store = app_env
        h.set("Upload RGNir images", _uploads(rng, 1))
        h.run()
        h.set("Upload RGNir images", [])
        h.set("Site Name", "Sparse")
        h.click("Create Site")
        h.run()
        (site,) = store.list_sites()
        h.unset("Site Name")
        h.set("Assign images to this site", lambda options: options)
        h.click("Assign")
        h.run()
        h.set("Assign images to this site", [])
        h.click("Generate Time Series Analysis")
        h.run()
        assert any("at least two images" in str(v) for v in h.values("warning"))

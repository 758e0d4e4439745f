"""Streamlit UI — the interactive surface of the framework.

Mirrors the reference app's feature set (process-images.py:993-1612):
wide layout with two tabs ("Image Analysis" / "Time Series Monitoring"),
multi-file uploader with in-batch hash dedupe, paginated 3-column
gallery (12/page) with per-image select + remove, store management
(dedupe button, two-step delete-all), gated comparison analysis
(originals -> white balanced -> per-index views with metric tiles and
ZIP download), and site-based time-series monitoring with change
detection.

All pixel math runs through the TPU-native pipelines; Streamlit only
presents results. Storage defaults to the filesystem backend
(RGNIR_STORE_ROOT env) and uses MongoDB when MONGODB_URI is set —
matching the reference's env-based config (process-images.py:21,29-32).

Run it where streamlit is installed:

    streamlit run rgnir_tpu/app/streamlit_app.py

Without streamlit, every flow is still exercised headlessly in
tests/test_app.py via rgnir_tpu.testing.fake_streamlit's AppHarness
(upload -> gallery -> compare -> ZIP, store management, sites +
time-series + change detection).
"""

from __future__ import annotations

import os

import numpy as np

import streamlit as st

from rgnir_tpu.config import ALL_INDICES, StoreConfig, registered_indices
from rgnir_tpu.store import DuplicateImageError, FsImageStore, MongoImageStore
from rgnir_tpu.store.base import compute_file_hash

IMAGES_PER_PAGE = StoreConfig().images_per_page  # 12 (process-images.py:1232)


def _index_names() -> list:
    """Builtins plus any register_index()-defined custom indices (the
    reference UI hardcodes its three, process-images.py:1296)."""
    return [k.value for k in ALL_INDICES] + [
        c.value for c in registered_indices()
    ]


@st.cache_resource
def get_store():
    try:  # .env support as in the reference (process-images.py:21)
        from dotenv import load_dotenv

        load_dotenv()
    except ImportError:
        pass
    uri = os.environ.get("MONGODB_URI")
    if not uri:
        try:  # st.secrets raises when no secrets.toml exists
            uri = st.secrets.get("MONGODB_URI", None)
        except FileNotFoundError:
            uri = None
    if uri and MongoImageStore is not None:
        return MongoImageStore(uri)
    return FsImageStore(os.environ.get("RGNIR_STORE_ROOT", "./rgnir_store"))


def uploader_section(store) -> None:
    uploaded = st.file_uploader(
        "Upload RGNir images",
        type=["tif", "tiff", "png", "jpg", "jpeg"],
        accept_multiple_files=True,
    )
    if not uploaded:
        return
    seen_hashes = set()
    stored = 0
    for f in uploaded:
        data = f.getvalue()
        digest = compute_file_hash(data)
        if digest in seen_hashes:
            st.warning(f"Skipped duplicate in batch: {f.name}")
            continue
        seen_hashes.add(digest)
        try:
            store.save_image(f.name, data)
            stored += 1
        except DuplicateImageError:
            st.info(f"Already stored: {f.name}")
        except Exception as e:  # noqa: BLE001
            st.error(f"Failed to store {f.name}: {e}")
    if stored:
        st.success(f"Stored {stored} new image(s)")
        st.rerun()


def management_section(store) -> None:
    with st.expander("Image store management"):
        if st.button("Remove duplicate images"):
            n = store.remove_duplicates()
            st.success(f"Removed {n} duplicates")
        if st.button("Delete ALL images"):
            st.session_state["confirm_delete_all"] = True
        if st.session_state.get("confirm_delete_all"):
            st.warning("This permanently deletes every stored image.")
            if st.button("Yes, really delete everything"):
                n = store.clear_all_images()
                st.session_state["confirm_delete_all"] = False
                st.success(f"Deleted {n} images")
                st.rerun()


def gallery_section(store) -> list:
    page = st.session_state.setdefault("gallery_page", 1)
    records, total = store.list_images(
        page=page, per_page=IMAGES_PER_PAGE, with_total=True
    )
    if total:
        pages = max(1, -(-total // IMAGES_PER_PAGE))
        cols = st.columns([1, 3, 1])
        if cols[0].button("Prev", disabled=page <= 1):
            st.session_state["gallery_page"] = page - 1
            st.rerun()
        cols[1].write(f"Page {page}/{pages} — {total} images")
        if cols[2].button("Next", disabled=page >= pages):
            st.session_state["gallery_page"] = page + 1
            st.rerun()

    selected = st.session_state.setdefault("selected_images", [])
    columns = st.columns(3)
    for i, rec in enumerate(records):
        with columns[i % 3]:
            cache_key = f"thumb_{rec.image_id}"
            if cache_key not in st.session_state:
                _, thumb = store.load_image(rec.image_id, thumbnail=True)
                st.session_state[cache_key] = thumb
            st.image(st.session_state[cache_key], caption=rec.filename)
            checked = st.checkbox(
                "Select", key=f"sel_{rec.image_id}",
                value=rec.image_id in selected,
            )
            if checked and rec.image_id not in selected:
                selected.append(rec.image_id)
            if not checked and rec.image_id in selected:
                selected.remove(rec.image_id)
            if st.button("Remove", key=f"rm_{rec.image_id}"):
                store.remove_image(rec.image_id)
                st.session_state.pop(cache_key, None)
                if rec.image_id in selected:
                    # A stale selection would crash the comparison flow
                    # on the next load of the removed id.
                    selected.remove(rec.image_id)
                st.rerun()
    return selected


def comparison_section(store, selected: list) -> None:
    if not selected:
        st.info("Select images in the gallery to compare.")
        return
    indices = st.multiselect(
        "Indices", _index_names(),
        default=[k.value for k in ALL_INDICES],
    )
    if not st.button("Generate Comparison Analysis"):
        return
    from rgnir_tpu.pipeline.compare import comparison_analysis
    from rgnir_tpu.pipeline.export import export_processed_zip

    images = []
    progress = st.progress(0.0)
    for i, image_id in enumerate(selected):
        rec, arr = store.load_array(image_id)
        images.append((rec.filename, arr))
        progress.progress((i + 1) / len(selected))
    result = comparison_analysis(images, kinds=indices)
    st.subheader("Original Images")
    st.image(result.original_figure)
    st.subheader("White Balanced")
    st.image(result.wb_figure)
    for kind in indices:
        st.subheader(kind)
        st.image(result.index_figures[kind])
        for filename, stats in result.index_stats[kind].items():
            st.caption(filename)
            tiles = st.columns(len(stats))
            for tile, (label, value) in zip(tiles, stats.items()):
                tile.metric(label, f"{value:.3f}")
    if images:
        zip_bytes = export_processed_zip(result.wb_arrays[0], indices)
        st.download_button(
            "Download processed images (ZIP)", zip_bytes,
            file_name="processed_images.zip",
        )


def time_series_tab(store) -> None:
    st.header("Time Series Monitoring")
    with st.expander("Create New Monitoring Site"):
        name = st.text_input("Site Name")
        description = st.text_area("Description (optional)")
        # Coordinates are an explicit opt-in; sites store None otherwise
        # (process-images.py:1008-1023).
        include_coords = st.checkbox("Include Coordinates")
        lat, lng = None, None
        if include_coords:
            col_lat, col_lng = st.columns(2)
            with col_lat:
                lat = st.number_input(
                    "Latitude", min_value=-90.0, max_value=90.0,
                    format="%.6f",
                )
            with col_lng:
                lng = st.number_input(
                    "Longitude", min_value=-180.0, max_value=180.0,
                    format="%.6f",
                )
        if st.button("Create Site"):
            if not name:
                st.error("Site name is required")
            else:
                coordinates = (
                    {"lat": lat, "lng": lng} if include_coords else None
                )
                try:
                    store.create_site(name, description, coordinates)
                    st.success(f"Site '{name}' created successfully!")
                    st.rerun()
                except Exception as e:  # noqa: BLE001
                    st.error(str(e))

    sites = store.list_sites()
    if not sites:
        st.info("Create a monitoring site to begin.")
        return
    site = st.selectbox(
        "Site", sites, format_func=lambda s: s.name
    )
    st.caption(site.description or "")

    assigned = {r.image_id for r in store.site_images(site.site_id)}
    all_recs, _ = store.list_images(page=1, per_page=1000)
    unassigned = [r for r in all_recs if r.image_id not in assigned]
    to_assign = st.multiselect(
        "Assign images to this site", unassigned,
        format_func=lambda r: r.filename,
    )
    if st.button("Assign") and to_assign:
        for rec in to_assign:
            store.assign_image_to_site(rec.image_id, site.site_id)
        st.rerun()

    index_name = st.selectbox("Index", _index_names())
    if st.button("Generate Time Series Analysis"):
        from rgnir_tpu.pipeline.timeseries import time_series_analysis

        recs = store.site_images(site.site_id)
        if len(recs) < 2:
            st.warning("Need at least two images for a time series.")
            return
        seq = []
        progress = st.progress(0.0)
        for i, rec in enumerate(recs):
            _, arr = store.load_array(rec.image_id)
            seq.append((rec.upload_date, arr))
            progress.progress((i + 1) / len(recs))
        res = time_series_analysis(seq, index_name)
        st.image(res.figure)
        st.dataframe(res.table)
        if res.change is not None:
            st.subheader("Change Detection (first vs last)")
            st.image(res.change["figure"])
            import io as _io

            buf = _io.BytesIO()
            res.change["figure"].save(buf, format="PNG")
            d1 = recs[0].upload_date.strftime("%Y%m%d")
            d2 = recs[-1].upload_date.strftime("%Y%m%d")
            st.download_button(
                "Download change report",
                buf.getvalue(),
                file_name=f"change_report_{index_name}_{d1}_to_{d2}.png",
            )


def main() -> None:
    st.set_page_config(layout="wide", page_title="RGNir Image Analyzer")
    store = get_store()
    tab1, tab2 = st.tabs(["Image Analysis", "Time Series Monitoring"])
    with tab1:
        with st.sidebar:
            if st.button("Clear cached thumbnails"):
                for key in list(st.session_state):
                    if key.startswith("thumb_"):
                        del st.session_state[key]
        uploader_section(store)
        management_section(store)
        selected = gallery_section(store)
        comparison_section(store, selected)
    with tab2:
        time_series_tab(store)


if __name__ == "__main__":
    main()

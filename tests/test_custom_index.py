"""Custom-index registry tests.

The reference hardcodes three indices in a dispatch chain
(process-images.py:466-485); this framework opens the family:
``config.register_index`` defines a new normalized-difference index
that flows through every path a builtin does — jnp ops, the fused
Pallas kernel, renders, stats, batch pipeline, and CLI.
"""

import json

import numpy as np
import pytest
from PIL import Image

import rgnir_tpu.config as config
from rgnir_tpu.config import (
    EPSILON,
    CustomIndex,
    IndexKind,
    register_index,
    registered_indices,
)


@pytest.fixture(autouse=True)
def _registry_sandbox():
    """Snapshot/restore the process-global registry around each test."""
    saved = dict(config._CUSTOM_INDICES)
    try:
        yield
    finally:
        config._CUSTOM_INDICES.clear()
        config._CUSTOM_INDICES.update(saved)


class TestRegistry:
    def test_register_parse_roundtrip(self):
        idx = register_index("RGRI", (0, 1), coverage_threshold=0.1,
                             cmap_name="viridis", feature_name="Soil")
        assert isinstance(idx, CustomIndex)
        assert IndexKind.parse("RGRI") is idx
        assert IndexKind.parse("rgri") is idx       # case-insensitive
        assert IndexKind.parse(idx) is idx          # already resolved
        assert idx.value == "RGRI"
        assert idx.coverage_threshold == 0.1
        assert idx.cmap_name == "viridis"
        assert idx in registered_indices()

    def test_builtin_collision_rejected(self):
        with pytest.raises(ValueError, match="collides with builtin"):
            register_index("ndvi", (0, 1))

    def test_bad_bands_rejected(self):
        with pytest.raises(ValueError, match="DISTINCT channels"):
            register_index("X1", (1, 1))
        with pytest.raises(ValueError, match="DISTINCT channels"):
            register_index("X2", (0, 3))

    def test_bad_name_rejected(self):
        # Names become output subdirectories ({out}/{NAME}/...), so
        # anything outside [A-Za-z0-9_-]+ must be refused — '..' would
        # write results one level ABOVE the chosen output directory.
        for bad in ("a/b", "a\\b", "a:b", "..", ".", "", "  ",
                    "a b", "a\tb", "\x00", "a\x07b"):
            with pytest.raises(ValueError, match="Bad index name"):
                register_index(bad, (0, 1))

    def test_good_names_accepted(self):
        for ok in ("SAVI-2", "re_edge", "X9"):
            register_index(ok, (2, 0))

    def test_rebind_refused_but_idempotent(self):
        a = register_index("REB", (0, 2))
        assert register_index("REB", (0, 2)) is a   # same spec: fine
        with pytest.raises(ValueError, match="already registered"):
            register_index("REB", (1, 2))           # different: refused

    def test_unknown_name_still_raises(self):
        with pytest.raises(ValueError, match="Unknown index type"):
            IndexKind.parse("NOPE")

    def test_static_jit_key(self):
        """Frozen + hashable: legal as a static jit argument."""
        a = register_index("HASHME", (0, 1))
        assert hash(a) == hash(CustomIndex(name="HASHME", bands=(0, 1)))


class TestCompute:
    def test_formula_matches_manual(self, rgnir_image):
        from rgnir_tpu.ops.indices import compute_index

        register_index("RNIR", (0, 2))  # (R - NIR) / (R + NIR + eps)
        got = np.asarray(compute_index(rgnir_image.astype(np.float32),
                                       "RNIR"))
        r = rgnir_image[..., 0].astype(np.float64)
        nir = rgnir_image[..., 2].astype(np.float64)
        want = np.clip((r - nir) / (r + nir + EPSILON), -1.0, 1.0)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_analyze_image_custom_kind(self, rgnir_image):
        """Full fused-jnp pass: custom kind present in every output dict,
        with its own coverage threshold driving the stats."""
        from rgnir_tpu.pipeline.fused import analyze_image

        register_index("RNIR2", (0, 2), coverage_threshold=-0.5,
                       cmap_name="RdYlBu")
        res = analyze_image(rgnir_image, kinds=("NDVI", "RNIR2"))
        assert set(res.indices) == {"NDVI", "RNIR2"}
        assert set(res.stats) == {"NDVI", "RNIR2"}
        assert set(res.renders) == {"NDVI", "RNIR2"}
        # (0, 2) is the exact negation of NDVI's (2, 0) up to eps.
        np.testing.assert_allclose(
            np.asarray(res.indices["RNIR2"]),
            -np.asarray(res.indices["NDVI"]), atol=1e-6,
        )
        # coverage uses the CUSTOM threshold (-0.5), not the builtin 0.2
        cov = float(res.stats["RNIR2"].coverage_pct)
        want = 100.0 * float(np.mean(np.asarray(res.indices["RNIR2"]) > -0.5))
        assert abs(cov - want) < 1e-4
        assert res.renders["RNIR2"].shape == rgnir_image.shape

    def test_pallas_kernel_parity(self, rgnir_image):
        """The fused Pallas kernel path handles a custom kind and agrees
        with the jnp reference path."""
        from rgnir_tpu.kernels.pipeline import analyze_image_kernel
        from rgnir_tpu.pipeline.fused import analyze_image_jit

        register_index("GR", (1, 0), coverage_threshold=0.0)
        kinds = ("NDVI", "GR")
        a = analyze_image_kernel(rgnir_image, kinds=kinds)
        b = analyze_image_jit(rgnir_image, kinds=kinds)
        for k in kinds:
            np.testing.assert_allclose(
                np.asarray(a.indices[k]), np.asarray(b.indices[k]),
                atol=2e-6,
            )
            assert float(a.stats[k].mean) == pytest.approx(
                float(b.stats[k].mean), abs=1e-5
            )
            np.testing.assert_array_equal(
                np.asarray(a.renders[k]), np.asarray(b.renders[k])
            )

    def test_render_bakes_unbaked_colormap(self, rgnir_image):
        """A custom index naming a colormap outside the build-time baked
        set renders via the on-demand LUT bake, matching matplotlib."""
        import matplotlib

        from rgnir_tpu.color import get_lut
        from rgnir_tpu.ops.colormap import render_colormap

        register_index("PLASMA_IDX", (2, 1), cmap_name="plasma")
        from rgnir_tpu.ops.indices import compute_index

        idx = compute_index(rgnir_image.astype(np.float32), "PLASMA_IDX")
        out = np.asarray(render_colormap(idx, IndexKind.parse("PLASMA_IDX")))
        lut = get_lut("plasma")
        mpl_cmap = matplotlib.colormaps["plasma"]
        mpl_cmap._init()  # same recipe as color/_bake.py
        want_lut = (np.asarray(mpl_cmap._lut[:256]) * 255).astype(np.uint8)
        np.testing.assert_array_equal(lut, want_lut)
        # Spot-check: value -1 -> LUT[0], value +1 -> LUT[255].
        flat = np.asarray(idx)
        lo = np.unravel_index(np.argmin(flat), flat.shape)
        byte = np.clip(
            np.round((flat[lo] - (-1.0)) / 2.0 * 255.0), 0, 255
        ).astype(np.uint8)
        np.testing.assert_array_equal(out[lo], lut[byte, :3])

    def test_get_lut_unknown_name_raises(self):
        from rgnir_tpu.color import get_lut

        with pytest.raises(ValueError, match="Unsupported colormap"):
            get_lut("definitely_not_a_cmap")

    def test_runtime_bake_isolated_and_thread_safe(self):
        """On-demand bakes go to a separate locked cache (never mutate
        the generated LUTS dict) and are race-free under concurrent
        first requests (Streamlit reruns are multi-threaded)."""
        import threading

        from rgnir_tpu import color

        baked_before = dict(color.LUTS)
        color._RUNTIME_LUTS.pop("cividis", None)
        results = []

        def grab():
            results.append(color.get_lut("cividis"))

        threads = [threading.Thread(target=grab) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 8
        first = results[0]
        for r in results[1:]:
            assert r is first  # single bake won the race, all share it
        assert color.LUTS == baked_before  # generated dict untouched
        assert "cividis" in color._RUNTIME_LUTS

    def test_runtime_bake_matches_public_api(self):
        """The bake recipe is verified against to_rgba(bytes=True) —
        matplotlib private-API drift fails loudly (ADVICE r3)."""
        import matplotlib
        from matplotlib import cm, colors

        from rgnir_tpu.color import get_lut

        lut = get_lut("magma")
        sm = cm.ScalarMappable(
            norm=colors.Normalize(0.0, 1.0),
            cmap=matplotlib.colormaps["magma"],
        )
        ref = sm.to_rgba(
            (np.arange(256, dtype=np.float64) + 0.5) / 256, bytes=True
        )
        np.testing.assert_array_equal(lut, np.asarray(ref, np.uint8))


class TestDistributedPaths:
    def test_sharded_mosaic_custom_kind(self, rng):
        """A custom kind through the sharded mosaic body matches the
        single-device fused pass."""
        from rgnir_tpu.parallel.mesh import local_mesh
        from rgnir_tpu.parallel.mosaic import analyze_mosaic
        from rgnir_tpu.pipeline.fused import analyze_image

        register_index("SH_RG", (0, 1), coverage_threshold=0.05)
        mosaic = rng.integers(0, 256, (200, 176, 3), dtype=np.uint8)
        res = analyze_mosaic(mosaic, kinds=("SH_RG",), mesh=local_mesh("d"))
        ref = analyze_image(mosaic, kinds=("SH_RG",), with_renders=False)
        got, want = res.stats["SH_RG"], ref.stats["SH_RG"]
        assert float(got.mean) == pytest.approx(float(want.mean), abs=1e-6)
        assert float(got.median) == float(want.median)
        assert float(got.min) == float(want.min)
        assert float(got.max) == float(want.max)
        assert float(got.coverage_pct) == pytest.approx(
            float(want.coverage_pct), abs=1e-6
        )

    def test_gigapixel_streamed_custom_kind(self, rng):
        """A custom kind through the streamed (larger-than-HBM) path is
        value-exact vs the in-memory reference."""
        import jax.numpy as jnp

        from rgnir_tpu.ops.indices import compute_index
        from rgnir_tpu.ops.stats import index_stats
        from rgnir_tpu.ops.wb import white_balance
        from rgnir_tpu.pipeline.gigapixel import analyze_mosaic_streamed

        kind = register_index("GP_GR", (1, 0))
        img = rng.integers(0, 256, (123, 157, 3), dtype=np.uint8)
        res = analyze_mosaic_streamed(img, kinds=("GP_GR",), band_rows=40)
        idx = compute_index(white_balance(jnp.asarray(img)), kind)
        ref = index_stats(idx, kind)
        got = res.stats["GP_GR"]
        assert float(got.min) == float(ref.min)
        assert float(got.max) == float(ref.max)
        assert float(got.median) == float(ref.median)
        np.testing.assert_allclose(float(got.mean), float(ref.mean),
                                   atol=2e-6)


class TestAppSurface:
    def test_comparison_offers_and_runs_custom_index(
        self, tmp_path, rng, monkeypatch
    ):
        """A registered custom index appears in the app's Indices
        multiselect options and flows through comparison + ZIP."""
        import io
        import zipfile

        from PIL import Image as PilImage

        from rgnir_tpu.testing import fake_streamlit

        fake_streamlit.install()
        from rgnir_tpu.app import streamlit_app
        from rgnir_tpu.store import FsImageStore
        from rgnir_tpu.testing.fake_streamlit import AppHarness, UploadedFile

        register_index("APPIDX", (0, 2), cmap_name="RdYlBu")
        monkeypatch.setenv("RGNIR_STORE_ROOT", str(tmp_path / "store"))
        monkeypatch.delenv("MONGODB_URI", raising=False)
        h = AppHarness(streamlit_app.main)
        store = FsImageStore(tmp_path / "store")

        ups = []
        for i in range(2):
            arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            buf = io.BytesIO()
            PilImage.fromarray(arr).save(buf, format="PNG")
            ups.append(UploadedFile(f"u{i}.png", buf.getvalue()))
        h.set("Upload RGNir images", ups)
        h.run()
        recs, _ = store.list_images()
        for rec in recs:
            h.set(f"sel_{rec.image_id}", True)
        h.set("Upload RGNir images", [])
        seen = {}

        def pick(options):
            seen["options"] = list(options)
            return ["NDVI", "APPIDX"]

        h.set("Indices", pick)
        h.click("Generate Comparison Analysis")
        h.run()
        assert "APPIDX" in seen["options"]
        subheaders = [str(v) for v in h.values("subheader")]
        assert "APPIDX" in subheaders
        downloads = h.by_type("download_button")
        zips = [d for d in downloads
                if d["file_name"] == "processed_images.zip"]
        names = zipfile.ZipFile(io.BytesIO(zips[0]["value"])).namelist()
        assert "APPIDX_visualization.png" in names


class TestCliDefineIndex:
    def test_batch_with_custom_index(self, tmp_path, rng, capsys):
        from rgnir_tpu.cli import main

        d = tmp_path / "in"
        d.mkdir()
        arr = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / "f0.png")
        rc = main([
            "--define-index", "MYIDX:0,2:0.1:RdYlGn:Soil",
            "batch", str(d), str(tmp_path / "out"),
            "--indices", "MYIDX",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["processed"] == 1
        assert (tmp_path / "out" / "MYIDX" / "f0_myidx.png").exists()

    def test_bad_spec_exits(self):
        from rgnir_tpu.cli import main

        with pytest.raises(SystemExit):
            main(["--define-index", "JUSTANAME", "selftest"])
        with pytest.raises(SystemExit):
            main(["--define-index", "X:1,1", "selftest"])

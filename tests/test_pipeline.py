"""Pipeline tests: batch directory processing (backend-process.py parity),
NDVI report (process-ndvi.py parity), compare, time series, change
detection, ZIP export."""

import io
import zipfile
from datetime import datetime
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

import golden


def _write_png(path: Path, arr: np.ndarray) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(path)


@pytest.fixture
def input_dir(tmp_path, rng):
    d = tmp_path / "in"
    d.mkdir()
    for i in range(5):
        _write_png(
            d / f"frame_{i}.png",
            rng.integers(0, 256, (40, 56, 3), dtype=np.uint8),
        )
    _write_png(
        d / "other_size.jpg", rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    )
    (d / "notes.txt").write_text("ignored")
    (d / "broken.png").write_bytes(b"corrupt bytes")
    return d


class TestBatchProcess:
    def test_output_tree_parity(self, input_dir, tmp_path):
        from rgnir_tpu.pipeline.batch import batch_process

        out = tmp_path / "out"
        summary = batch_process(
            input_dir, out, save_wb=True, indices=("NDVI", "NDWI")
        )
        assert summary["processed"] == 6
        assert len(summary["failed"]) == 1  # broken.png
        # backend-process.py:55-72 output tree
        for i in range(5):
            assert (out / "white_balanced" / f"frame_{i}_wb.tif").exists()
            assert (out / "NDVI" / f"frame_{i}_ndvi.png").exists()
            assert (out / "NDWI" / f"frame_{i}_ndwi.png").exists()
        assert (out / "NDVI" / "other_size_ndvi.png").exists()
        assert not (out / "NDVI" / "notes_ndvi.png").exists()

    def test_wb_output_matches_reference(self, input_dir, tmp_path):
        from rgnir_tpu.pipeline.batch import batch_process

        out = tmp_path / "out"
        batch_process(input_dir, out, save_wb=True, indices=())
        src = np.asarray(Image.open(input_dir / "frame_0.png"))
        got = np.asarray(Image.open(out / "white_balanced" / "frame_0_wb.tif"))
        want = golden.golden_white_balance(src)
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 1

    def test_resume_skips_done(self, input_dir, tmp_path):
        from rgnir_tpu.pipeline.batch import batch_process

        out = tmp_path / "out"
        s1 = batch_process(input_dir, out, indices=("NDVI",))
        s2 = batch_process(input_dir, out, indices=("NDVI",))
        assert s1["processed"] == 6
        assert s2["processed"] == 0
        assert s2["skipped"] == 6

    def test_write_failure_retried_on_resume(self, input_dir, tmp_path,
                                             monkeypatch):
        """An async encode/write failure (surfaced only at writer.close)
        must not leave its input marked done — resume retries it."""
        import rgnir_tpu.io.writer as writer_mod
        from rgnir_tpu.pipeline.batch import batch_process

        real = writer_mod._write_array

        def flaky(path, array):
            if path.name == "frame_2_ndvi.png":
                raise OSError("disk full (injected)")
            return real(path, array)

        monkeypatch.setattr(writer_mod, "_write_array", flaky)
        out = tmp_path / "out"
        s1 = batch_process(input_dir, out, indices=("NDVI",))
        assert any(p.name == "frame_2_ndvi.png" for p, _ in s1["failed"])
        assert not (out / "NDVI" / "frame_2_ndvi.png").exists()
        # Resume with a healthy writer: only frame_2 is reprocessed.
        monkeypatch.setattr(writer_mod, "_write_array", real)
        s2 = batch_process(input_dir, out, indices=("NDVI",))
        assert s2["processed"] == 1
        assert s2["skipped"] == 5
        assert (out / "NDVI" / "frame_2_ndvi.png").exists()


class TestNdviReport:
    def test_report_outputs(self, tmp_path, rgnir_image):
        from rgnir_tpu.pipeline.single import generate_ndvi_report

        src = tmp_path / "img.png"
        _write_png(src, rgnir_image)
        ndvi, stats = generate_ndvi_report(src, tmp_path / "report")
        # process-ndvi.py:89-108 outputs
        assert (tmp_path / "report" / "ndvi_visualization.png").exists()
        assert (tmp_path / "report" / "ndvi_histogram.png").exists()
        txt = (tmp_path / "report" / "ndvi_statistics.txt").read_text()
        assert txt.startswith("NDVI Statistics:\n")
        for key in (
            "mean_ndvi", "median_ndvi", "min_ndvi", "max_ndvi", "std_ndvi",
            "vegetation_coverage",
        ):
            assert key in txt
        # stats parity vs reference math (raw image, no WB)
        want = golden.golden_ndvi_statistics(
            golden.golden_index(rgnir_image, "NDVI")
        )
        for k, v in want.items():
            assert stats[k] == pytest.approx(v, abs=1e-4), k

    def test_report_odd_shapes_through_figure_cache(self, tmp_path, rng):
        """Consecutive reports at DIFFERENT odd shapes must work — the
        reused viz figure is keyed by array shape and rebuilds when it
        changes (a serving process sees mixed camera resolutions)."""
        from rgnir_tpu.pipeline.single import generate_ndvi_report

        for i, shape in enumerate([(97, 131), (64, 64), (97, 131)]):
            img = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
            src = tmp_path / f"img{i}.png"
            _write_png(src, img)
            ndvi, stats = generate_ndvi_report(src, tmp_path / f"rep{i}")
            assert ndvi.shape == shape
            assert -1.0 <= stats["median_ndvi"] <= 1.0
            assert (tmp_path / f"rep{i}" / "ndvi_visualization.png").exists()


class TestExportZip:
    def test_zip_contents(self, rgnir_image):
        from rgnir_tpu.pipeline.export import export_processed_zip

        wb = golden.golden_white_balance(rgnir_image)
        blob = export_processed_zip(wb, ("NDVI", "GNDVI"), figures=False)
        zf = zipfile.ZipFile(io.BytesIO(blob))
        names = set(zf.namelist())
        assert names == {
            "white_balanced.png",
            "NDVI_visualization.png",
            "GNDVI_visualization.png",
        }
        wb_back = np.asarray(Image.open(io.BytesIO(zf.read("white_balanced.png"))))
        np.testing.assert_array_equal(wb_back, wb)

    def test_zip_figure_mode(self, rgnir_image):
        """figures=True writes the reference's colorbar figures
        (process-images.py:596)."""
        from rgnir_tpu.pipeline.export import export_processed_zip

        wb = golden.golden_white_balance(rgnir_image)
        blob = export_processed_zip(wb, ("NDVI",), figures=True)
        zf = zipfile.ZipFile(io.BytesIO(blob))
        img = Image.open(io.BytesIO(zf.read("NDVI_visualization.png")))
        # a 10x8in @100dpi tight-bbox figure is much larger than the
        # 128x96 source map and includes the colorbar margin
        assert img.size[0] > 500 and img.size[1] > 400


class TestCompare:
    def test_comparison_stats(self, rng):
        from rgnir_tpu.pipeline.compare import comparison_analysis

        imgs = [
            ("a.png", rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)),
            ("b.png", rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)),
            ("c.png", rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)),
        ]
        res = comparison_analysis(imgs, kinds=("NDVI",), with_figures=True)
        assert set(res.index_stats["NDVI"]) == {"a.png", "b.png", "c.png"}
        for name, arr in imgs:
            wb = golden.golden_white_balance(arr)
            idx = golden.golden_index(wb, "NDVI")
            want = golden.golden_analyze_index(idx, "NDVI")
            got = res.index_stats["NDVI"][name]
            for k in want:
                assert got[k] == pytest.approx(want[k], abs=2e-2), (name, k)
        assert res.original_figure is not None
        assert res.index_figures["NDVI"].size[0] > 0

    def test_duplicate_basenames_disambiguated(self, rng):
        """Two images named field.png (different directories via the
        CLI) must not overwrite each other's stats."""
        from rgnir_tpu.pipeline.compare import comparison_analysis

        a = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        b = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        res = comparison_analysis(
            [("field.png", a), ("field.png", b)],
            kinds=("NDVI",), with_figures=False,
        )
        assert set(res.index_stats["NDVI"]) == {"field.png", "field.png (2)"}
        wa = golden.golden_analyze_index(
            golden.golden_index(golden.golden_white_balance(a), "NDVI"),
            "NDVI")
        got = res.index_stats["NDVI"]["field.png"]
        assert got["Mean NDVI"] == pytest.approx(wa["Mean NDVI"], abs=2e-2)


class TestTimeSeries:
    def test_table_and_change(self, rng):
        from rgnir_tpu.pipeline.timeseries import time_series_analysis

        dates = [datetime(2025, m, 1) for m in (3, 5, 7)]
        base = rng.integers(40, 200, (48, 48, 3), dtype=np.uint8)
        seq = [
            (d, np.clip(base + rng.integers(-20, 20, base.shape), 0, 255).astype(np.uint8))
            for d in dates
        ]
        res = time_series_analysis(seq, "NDVI")
        assert list(res.table["Date"]) == dates
        assert "Vegetation Coverage (%)" in res.table.columns
        # row parity vs reference math for the first image
        wb = golden.golden_white_balance(np.asarray(seq[0][1]))
        idx = golden.golden_index(wb, "NDVI")
        assert res.table["Mean"][0] == pytest.approx(float(np.mean(idx)), abs=2e-2)
        assert res.figure is not None
        assert res.change is not None
        assert res.change["figure"] is not None
        assert res.change["diff"].shape == (48, 48)
        assert res.series_changes is None  # opt-in

        # Mismatched endpoint shapes: the change step is skipped (not
        # a crash) and the stats table still covers every image.
        ragged = seq + [(datetime(2025, 9, 1),
                         rng.integers(40, 200, (32, 48, 3), dtype=np.uint8))]
        res_r = time_series_analysis(ragged, "NDVI")
        assert res_r.change is None
        assert len(res_r.table) == 4

        res2 = time_series_analysis(seq, "NDVI", with_series_changes=True)
        sc = res2.series_changes
        assert sc is not None
        assert sc["diffs"].shape == (2, 48, 48)
        assert sc["shifts"].shape == (2, 2)
        assert sc["pairs"] == [(dates[0], dates[1]), (dates[1], dates[2])]
        assert sc["stats"]["mean"].shape == (2,)


class TestChangeDetection:
    def test_shift_recovery_and_diff(self, rng):
        from rgnir_tpu.pipeline.change import change_detection

        base = np.kron(
            rng.integers(0, 256, (12, 12, 3), dtype=np.uint8),
            np.ones((8, 8, 1), dtype=np.uint8),
        )
        shifted = np.roll(base, (-3, 5), axis=(0, 1))
        res = change_detection(base, shifted, "NDVI", "2025-01-01", "2025-06-01")
        assert tuple(res["shift"]) == (3.0, -5.0)
        # aligned late ~= early -> diff near zero in the interior
        assert np.abs(res["diff"][10:-10, 10:-10]).mean() < 0.02
        assert res["figure"] is not None

    def test_change_series_matches_pairwise(self, rng):
        """The batched consecutive-pair series equals change_maps run
        pair by pair, and recovers each pair's shift."""
        import jax.numpy as jnp

        from rgnir_tpu.pipeline.change import change_maps, change_series_maps

        base = np.kron(
            rng.integers(0, 256, (12, 12, 3), dtype=np.uint8),
            np.ones((8, 8, 1), dtype=np.uint8),
        )
        rolls = [(0, 0), (2, -1), (-3, 4), (1, 2)]
        stack = np.stack([np.roll(base, r, axis=(0, 1)) for r in rolls])
        diffs, shifts, stats = change_series_maps(jnp.asarray(stack), "NDVI")
        assert diffs.shape == (3, 96, 96) and shifts.shape == (3, 2)
        for t in range(3):
            want = np.asarray(change_maps(
                jnp.asarray(stack[t]), jnp.asarray(stack[t + 1]), "NDVI"
            )[2])
            np.testing.assert_array_equal(np.asarray(diffs[t]), want)
        # consecutive relative shifts recovered exactly
        expect = [
            (rolls[t][0] - rolls[t + 1][0], rolls[t][1] - rolls[t + 1][1])
            for t in range(3)
        ]
        np.testing.assert_array_equal(np.asarray(shifts), expect)
        assert np.asarray(stats["std"]).shape == (3,)

"""CLI tests — the surface replacing backend-process.py / process-ndvi.py
entry points."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from rgnir_tpu.cli import main


def _write_png(path: Path, arr: np.ndarray) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(path)


@pytest.fixture
def image_file(tmp_path, rgnir_image):
    p = tmp_path / "field.png"
    _write_png(p, rgnir_image)
    return p


class TestCli:
    def test_batch(self, tmp_path, rng, capsys):
        d = tmp_path / "in"
        for i in range(3):
            _write_png(d / f"f{i}.png", rng.integers(0, 256, (24, 24, 3), dtype=np.uint8))
        rc = main(["batch", str(d), str(tmp_path / "out"), "--wb",
                   "--indices", "NDVI"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["processed"] == 3
        assert (tmp_path / "out" / "NDVI" / "f0_ndvi.png").exists()
        assert (tmp_path / "out" / "white_balanced" / "f0_wb.tif").exists()

    def test_watch_processes_files_arriving_between_polls(
        self, tmp_path, rng, capsys
    ):
        """Hot-folder mode: a file added after the first poll is picked
        up by a later poll; the manifest prevents reprocessing."""
        import threading
        import time

        d = tmp_path / "hot"
        _write_png(d / "a.png",
                   rng.integers(0, 256, (24, 24, 3), dtype=np.uint8))

        def add_later():
            time.sleep(0.35)
            _write_png(d / "b.png",
                       rng.integers(0, 256, (24, 24, 3), dtype=np.uint8))

        t = threading.Thread(target=add_later)
        t.start()
        rc = main(["watch", str(d), str(tmp_path / "out"),
                   "--indices", "NDVI", "--interval", "0.15",
                   "--max-idle", "5"])
        t.join()
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["processed"] == 2
        assert (tmp_path / "out" / "NDVI" / "a_ndvi.png").exists()
        assert (tmp_path / "out" / "NDVI" / "b_ndvi.png").exists()

    def test_watch_bad_file_still_exits_on_max_idle(self, tmp_path, rng,
                                                    capsys):
        d = tmp_path / "hot"
        _write_png(d / "ok.png",
                   rng.integers(0, 256, (24, 24, 3), dtype=np.uint8))
        (d / "bad.png").write_bytes(b"not an image")
        rc = main(["watch", str(d), str(tmp_path / "out"),
                   "--indices", "NDVI", "--interval", "0.05",
                   "--max-idle", "2"])
        assert rc == 1  # failure reported, but the loop terminated
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["processed"] == 1

    def test_bench_lite(self, capsys):
        rc = main(["bench", "--batch", "2", "--size", "32",
                   "--iters", "2", "--reps", "2"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["batch"] == 2 and out["size"] == 32
        assert out["mpix_per_s"] > 0

    def test_report(self, image_file, tmp_path, capsys):
        rc = main(["report", str(image_file), str(tmp_path / "rep")])
        assert rc == 0
        assert "NDVI Analysis Summary:" in capsys.readouterr().out
        assert (tmp_path / "rep" / "ndvi_statistics.txt").exists()

    def test_analyze_json(self, image_file, capsys):
        rc = main(["analyze", str(image_file), "--indices", "NDVI,NDWI"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert "Mean NDVI" in out["NDVI"]
        assert "Water Coverage (%)" in out["NDWI"]

    def test_compare(self, tmp_path, rng, capsys):
        paths = []
        for i in range(2):
            p = tmp_path / f"c{i}.png"
            _write_png(p, rng.integers(0, 256, (24, 24, 3), dtype=np.uint8))
            paths.append(str(p))
        rc = main(["compare", *paths, "--indices", "NDVI",
                   "--out", str(tmp_path / "cmp")])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert set(out["NDVI"]) == {"c0.png", "c1.png"}
        assert (tmp_path / "cmp" / "comparison_ndvi.png").exists()
        assert (tmp_path / "cmp" / "comparison_original.png").exists()

    def test_mosaic(self, image_file, capsys):
        rc = main(["mosaic", str(image_file), "--indices", "NDVI"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert "Mean NDVI" in out["NDVI"]

    def test_mosaic_streamed_matches_in_memory(
        self, image_file, capsys, monkeypatch
    ):
        from rgnir_tpu.pipeline import gigapixel

        monkeypatch.setattr(gigapixel, "_CHUNK", 4096)
        rc = main(["mosaic", str(image_file), "--indices", "NDVI"])
        in_mem = json.loads(capsys.readouterr().out)
        rc2 = main(["mosaic", str(image_file), "--indices", "NDVI",
                    "--streamed", "--band-rows", "7"])
        streamed = json.loads(capsys.readouterr().out)
        assert rc == rc2 == 0
        assert streamed["NDVI"]["Median NDVI"] == in_mem["NDVI"]["Median NDVI"]
        assert abs(
            streamed["NDVI"]["Mean NDVI"] - in_mem["NDVI"]["Mean NDVI"]
        ) < 1e-5

    def test_mosaic_streamed_npy_memmap(self, tmp_path, rng, capsys,
                                        monkeypatch):
        from rgnir_tpu.pipeline import gigapixel

        monkeypatch.setattr(gigapixel, "_CHUNK", 4096)
        img = rng.integers(0, 256, (40, 32, 3), dtype=np.uint8)
        p = tmp_path / "m.npy"
        np.save(p, img)
        rc = main(["mosaic", str(p), "--streamed", "--indices", "NDVI",
                   "--band-rows", "16"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert "Mean NDVI" in out["NDVI"]

    def test_mosaic_streamed_host_reduce_identical(
        self, tmp_path, rng, capsys, monkeypatch
    ):
        from rgnir_tpu.pipeline import gigapixel

        monkeypatch.setattr(gigapixel, "_CHUNK", 4096)
        img = rng.integers(0, 256, (40, 32, 3), dtype=np.uint8)
        p = tmp_path / "m.npy"
        np.save(p, img)
        base = ["mosaic", str(p), "--streamed", "--indices", "NDVI",
                "--band-rows", "16"]
        assert main(base) == 0
        dev = json.loads(capsys.readouterr().out)
        assert main(base + ["--reduce", "host"]) == 0
        host = json.loads(capsys.readouterr().out)
        assert dev == host

    def test_mosaic_reduce_requires_streamed(self, tmp_path, rng):
        img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        p = tmp_path / "m.npy"
        np.save(p, img)
        with pytest.raises(SystemExit, match="--streamed"):
            main(["mosaic", str(p), "--reduce", "host"])

    def test_change(self, tmp_path, rgnir_image, capsys):
        early = tmp_path / "early.png"
        late = tmp_path / "late.png"
        _write_png(early, rgnir_image)
        _write_png(late, np.roll(rgnir_image, (2, -1), axis=(0, 1)))
        rc = main(["change", str(early), str(late), "--index", "NDVI",
                   "--out", str(tmp_path / "chg")])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert len(out["shift"]) >= 2
        assert (tmp_path / "chg" / "change_ndvi.png").exists()

    def test_change_full_res(self, tmp_path, rgnir_image, capsys):
        early = tmp_path / "early.png"
        late = tmp_path / "late.png"
        _write_png(early, rgnir_image)
        _write_png(late, np.roll(rgnir_image, (2, -1), axis=(0, 1)))
        rc = main(["change", str(early), str(late), "--full-res",
                   "--out", str(tmp_path / "chg2")])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["shift"] == [-2.0, 1.0]  # exact roll recovery
        assert "diff_median" in out
        assert (tmp_path / "chg2" / "change_ndvi.png").exists()

    def test_change_refine_tile(self, tmp_path, rgnir_image, capsys):
        early = tmp_path / "early.png"
        late = tmp_path / "late.png"
        _write_png(early, rgnir_image)
        _write_png(late, np.roll(rgnir_image, (2, -1), axis=(0, 1)))
        rc = main(["change", str(early), str(late), "--refine-tile", "16",
                   "--out", str(tmp_path / "chg3")])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert len(out["shift"]) >= 2
        assert (tmp_path / "chg3" / "change_ndvi.png").exists()

    def test_change_full_res_refined(self, tmp_path, rgnir_image, capsys):
        """--full-res --refine-tile: the SHARDED non-rigid path — the
        summary reports the applied per-tile field ranges."""
        early = tmp_path / "early.png"
        late = tmp_path / "late.png"
        _write_png(early, rgnir_image)
        _write_png(late, np.roll(rgnir_image, (2, -1), axis=(0, 1)))
        rc = main(["change", str(early), str(late), "--full-res",
                   "--refine-tile", "32"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["shift"] == [-2.0, 1.0]
        lo, hi = out["field_dy_range"]
        assert -4.0 <= lo <= hi <= 0.0  # around the global -2
        assert "field_dx_range" in out

    def test_store_and_sites_roundtrip(self, tmp_path, image_file, capsys):
        root = str(tmp_path / "storedir")
        assert main(["store", "upload", str(image_file), "--root", root]) == 0
        assert main(["store", "upload", str(image_file), "--root", root]) == 0
        out = capsys.readouterr().out
        assert "duplicate skipped" in out
        assert main(["store", "list", "--root", root]) == 0
        out = capsys.readouterr().out
        assert "total: 1" in out
        image_id = out.strip().splitlines()[-1].split()[0]

        assert main(["sites", "create", "--root", root, "--name", "Plot 7",
                     "--lat", "52.1", "--lng", "4.3"]) == 0
        site_id = capsys.readouterr().out.split()[2].rstrip(":")
        assert main(["sites", "assign", "--root", root,
                     "--image-id", image_id, "--site-id", site_id]) == 0
        assert main(["sites", "list", "--root", root]) == 0
        assert "Plot 7" in capsys.readouterr().out


class TestCliMongo:
    def test_store_upload_list_with_fake_mongo(self, image_file, capsys):
        """--mongo routes through the real MongoImageStore code (driven
        by the vendored pymongo fake)."""
        from rgnir_tpu.testing import fake_mongo

        fake_mongo.install()
        fake_mongo.reset()
        rc = main(["store", "upload", str(image_file),
                   "--mongo", "mongodb://fake-cli"])
        assert rc == 0
        assert "stored field.png" in capsys.readouterr().out
        rc = main(["store", "list", "--mongo", "mongodb://fake-cli"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "total: 1" in out and "field.png" in out


class TestRgn:
    def test_correct_and_viz(self, image_file, tmp_path, rgnir_image, capsys):
        import golden

        rc = main(["rgn", str(image_file),
                   "--out", str(tmp_path / "c.png"),
                   "--viz", str(tmp_path / "v.png")])
        assert rc == 0
        got = np.asarray(Image.open(tmp_path / "c.png"))
        want = golden.golden_white_balance(rgnir_image)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
        viz = Image.open(tmp_path / "v.png")
        assert viz.size == (2 * rgnir_image.shape[1], rgnir_image.shape[0])

    def test_noop_errors(self, image_file):
        assert main(["rgn", str(image_file)]) == 2


class TestStreaming:
    def test_stream_analyzer(self, rng):
        from rgnir_tpu.pipeline.streaming import StreamAnalyzer

        an = StreamAnalyzer(frame_shape=(64, 96), kinds=("NDVI",), depth=2)
        an.warmup()
        results = []
        for i in range(5):
            frame = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
            r = an.submit(frame)
            if r is not None:
                results.append(r)
        results.extend(an.drain())
        assert [r.frame_id for r in results] == list(range(5))
        m = float(results[0].stats["NDVI"].mean)
        assert -1.0 <= m <= 1.0

    def test_batched_stream_matches_single(self, rng):
        """batch=2 produces per-frame results identical to batch=1 for
        the same frames, including the padded tail flush (5 frames)."""
        from rgnir_tpu.pipeline.streaming import StreamAnalyzer

        frames = [rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
                  for _ in range(5)]

        def run(batch):
            an = StreamAnalyzer(frame_shape=(32, 48), kinds=("NDVI",),
                                depth=1, batch=batch)
            out = []
            for f in frames:
                r = an.submit(f)
                if r is not None:
                    out.append(r)
            out.extend(an.drain())
            return out

        one, two = run(1), run(2)
        assert [r.frame_id for r in one] == [r.frame_id for r in two] \
            == list(range(5))
        for a, b in zip(one, two):
            assert float(a.stats["NDVI"].mean) == float(b.stats["NDVI"].mean)
            assert float(a.stats["NDVI"].median) == \
                float(b.stats["NDVI"].median)

    def test_shape_mismatch_raises(self, rng):
        from rgnir_tpu.pipeline.streaming import StreamAnalyzer

        an = StreamAnalyzer(frame_shape=(32, 32), kinds=("NDVI",))
        with pytest.raises(ValueError, match="frame shape"):
            an.submit(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))

    def test_ring_fed_stream(self, rng):
        """End-to-end: native shm ring -> StreamAnalyzer."""
        from rgnir_tpu.native import FrameRing, native_available
        from rgnir_tpu.pipeline.streaming import StreamAnalyzer

        if not native_available():
            pytest.skip("native ring unavailable")
        shape = (32, 48)
        an = StreamAnalyzer(frame_shape=shape, kinds=("NDVI",), depth=1)
        an.warmup()
        with FrameRing.create("/rgnir_stream_test", shape + (3,), 4) as ring:
            for _ in range(3):
                assert ring.try_push(
                    rng.integers(0, 256, shape + (3,), dtype=np.uint8)
                )
            results = list(an.run_from_ring(ring, max_frames=3))
        assert [r.frame_id for r in results] == [0, 1, 2]


class TestSweepCacheHygiene:
    """selftest and tune compile one-off shapes (awkward selftest
    inputs, block-size sweep variants) that no production path ever
    loads; with every compile persisted they must NOT land in the
    repo-committed .jax_cache (a single selftest run once wrote 206
    junk entries there)."""

    @pytest.fixture(autouse=True)
    def _restore_cache_dir(self):
        # main() mutates global jax.config (cache dir, min compile
        # time) through enable_compilation_cache; monkeypatch cannot
        # undo jax.config.update, so snapshot/restore explicitly to
        # keep the state from leaking into later tests.
        import jax

        before_dir = jax.config.jax_compilation_cache_dir
        before_min = jax.config.jax_persistent_cache_min_compile_time_secs
        try:
            yield
        finally:
            jax.config.update("jax_compilation_cache_dir", before_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", before_min
            )

    def test_cmd_tune_redirects_compile_cache(self, monkeypatch):
        import jax

        from rgnir_tpu.utils.compile_cache import machine_local_cache_dir

        seen = {}

        def fake_tune(sizes):
            seen["sizes"] = sizes
            seen["cache_dir"] = jax.config.jax_compilation_cache_dir
            return {}

        monkeypatch.delenv("RGNIR_COMPILE_CACHE_DIR", raising=False)
        monkeypatch.setattr(
            "rgnir_tpu.utils.autotune.tune_kernels", fake_tune
        )
        rc = main(["tune", "--sizes", "512"])
        assert rc == 0
        assert seen["sizes"] == (512,)
        # Per-user machine-local dir (never a world-writable fixed
        # /tmp path, never the repo-committed .jax_cache).
        assert seen["cache_dir"] == str(machine_local_cache_dir("tune"))

    def test_machine_local_cache_dir_is_per_user(self):
        import os
        from pathlib import Path

        from rgnir_tpu.utils.compile_cache import machine_local_cache_dir

        d = machine_local_cache_dir("tune")
        # Per-user property: rooted under the user's cache root (XDG
        # or ~/.cache), never a fixed shared path — the root itself may
        # legitimately live anywhere (even under /tmp in some CI
        # homes), so assert the derivation, not the prefix.
        root = Path(os.environ.get("XDG_CACHE_HOME",
                                   Path.home() / ".cache"))
        assert d == root / "rgnir_tpu" / "tune"
        assert d.is_dir()

    def test_cmd_tune_honors_env_override(self, monkeypatch, tmp_path):
        import jax

        seen = {}
        monkeypatch.setenv("RGNIR_COMPILE_CACHE_DIR", str(tmp_path / "c"))
        monkeypatch.setattr(
            "rgnir_tpu.utils.autotune.tune_kernels",
            lambda sizes: seen.update(
                cache_dir=jax.config.jax_compilation_cache_dir
            ) or {},
        )
        assert main(["tune", "--sizes", "512"]) == 0
        assert seen["cache_dir"] == str(tmp_path / "c")


class TestWarmupPrune:
    def test_restore_preprune_puts_old_cache_back(self, tmp_path):
        """A failed warm after --prune emptied the cache must restore
        the pre-prune artifact (never leave an empty committed cache)."""
        from rgnir_tpu.cli import _restore_preprune

        cache = tmp_path / ".jax_cache"
        backup = tmp_path / ".jax_cache.preprune"
        backup.mkdir()
        (backup / "old-entry").write_bytes(b"x" * 10)
        cache.mkdir()
        (cache / "partial-entry").write_bytes(b"y")
        _restore_preprune(cache, backup)
        assert not backup.exists()
        assert (cache / "old-entry").read_bytes() == b"x" * 10
        assert not (cache / "partial-entry").exists()

    def test_restore_preprune_noop_without_backup(self, tmp_path):
        from rgnir_tpu.cli import _restore_preprune

        cache = tmp_path / ".jax_cache"
        cache.mkdir()
        (cache / "entry").write_bytes(b"z")
        _restore_preprune(cache, None)
        assert (cache / "entry").exists()

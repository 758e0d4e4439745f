"""IO layer tests: shape-bucketed async loader, writer, decode."""

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from rgnir_tpu.config import LoaderConfig
from rgnir_tpu.io import AsyncWriter, BatchLoader, decode_bytes, decode_file
from rgnir_tpu.io.writer import encode_png


def _write(path: Path, arr: np.ndarray) -> Path:
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(path)
    return path


class TestDecode:
    def test_roundtrip(self, tmp_path, rng):
        arr = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
        p = _write(tmp_path / "x.png", arr)
        np.testing.assert_array_equal(decode_file(p), arr)
        np.testing.assert_array_equal(decode_bytes(p.read_bytes()), arr)

    def test_grayscale_promoted_to_3ch(self, tmp_path, rng):
        gray = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        p = tmp_path / "g.png"
        Image.fromarray(gray, mode="L").save(p)
        out = decode_file(p)
        assert out.shape == (16, 16, 3)


class TestBatchLoader:
    def test_shape_bucketing_and_order(self, tmp_path, rng):
        paths = []
        for i in range(5):
            paths.append(_write(tmp_path / f"a{i}.png",
                                rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)))
        for i in range(3):
            paths.append(_write(tmp_path / f"b{i}.png",
                                rng.integers(0, 256, (8, 24, 3), dtype=np.uint8)))
        loader = BatchLoader(paths, cfg=LoaderConfig(batch_size=2, decode_workers=3))
        batches = list(loader)
        # every batch is same-shape; all 8 images appear exactly once
        seen = []
        for b in batches:
            assert b.images.shape[0] == len(b.paths) == len(b.indices)
            assert len({a.shape for a in b.images}) == 1
            seen.extend(b.indices)
        assert sorted(seen) == list(range(8))
        assert not loader.failures

    def test_arena_and_streaming_paths_agree(self, tmp_path, rng):
        """The probe-first arena path must yield exactly the images the
        streaming PIL path yields (same pixels, paths, indices)."""
        paths = []
        for i, (h, w) in enumerate([(16, 16)] * 3 + [(8, 24)] * 2):
            paths.append(_write(tmp_path / f"i{i}.png",
                                rng.integers(0, 256, (h, w, 3), dtype=np.uint8)))

        def collect(arena: bool):
            loader = BatchLoader(
                paths, cfg=LoaderConfig(batch_size=2, arena_decode=arena)
            )
            out = {}
            for b in loader:
                for j, i in enumerate(b.indices):
                    out[i] = (b.paths[j], b.images[j])
            assert not loader.failures
            return out

        a, s = collect(True), collect(False)
        assert a.keys() == s.keys() == set(range(5))
        for i in a:
            assert a[i][0] == s[i][0]
            np.testing.assert_array_equal(a[i][1], s[i][1])

    def test_arena_decode_failure_retries_via_pil(self, tmp_path, rng,
                                                  monkeypatch):
        """A file the native batch decoder rejects (but PIL can read)
        must still be yielded — via the streaming fallback — not
        recorded as a failure (regression: the arena path used to drop
        such images the old default handled)."""
        from rgnir_tpu.native import imgio

        if not imgio.native_available():
            pytest.skip("native decoder unavailable")
        arrs = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
                for _ in range(3)]
        paths = [_write(tmp_path / f"r{i}.png", a)
                 for i, a in enumerate(arrs)]

        real = imgio.decode_batch

        def flaky_batch(batch_paths, shape=None, threads=None):
            arena, status = real(batch_paths, shape, threads)
            for j, p in enumerate(batch_paths):
                if Path(p).name == "r1.png":  # native "can't decode"
                    status[j] = -2
                    arena[j] = 0
            return arena, status

        monkeypatch.setattr(imgio, "decode_batch", flaky_batch)
        loader = BatchLoader(paths, cfg=LoaderConfig(batch_size=4))
        out = {}
        for b in loader:
            for j, i in enumerate(b.indices):
                out[i] = b.images[j]
        assert not loader.failures
        assert sorted(out) == [0, 1, 2]
        for i, a in enumerate(arrs):
            np.testing.assert_array_equal(out[i], a)

    def test_decode_cache(self, tmp_path, rng):
        from rgnir_tpu.io.cache import DecodedCache

        arr = rng.integers(0, 256, (12, 10, 3), dtype=np.uint8)
        p = _write(tmp_path / "x.png", arr)
        cache = DecodedCache(tmp_path / "cache")
        assert cache.get(p) is None
        calls = []

        def decode(path):
            calls.append(path)
            from rgnir_tpu.io.decode import decode_file

            return decode_file(path)

        cached = cache.wrap(decode)
        np.testing.assert_array_equal(cached(p), arr)
        np.testing.assert_array_equal(cached(p), arr)
        assert len(calls) == 1  # second read came from the cache
        # rewriting the source invalidates the entry
        arr2 = rng.integers(0, 256, (12, 10, 3), dtype=np.uint8)
        import os
        import time as _t

        _write(p, arr2)
        os.utime(p, (_t.time() + 2, _t.time() + 2))
        np.testing.assert_array_equal(cached(p), arr2)
        assert len(calls) == 2

    def test_decode_cache_eviction(self, tmp_path, rng):
        from rgnir_tpu.io.cache import DecodedCache

        cache = DecodedCache(tmp_path / "cache", max_bytes=1000)
        for i in range(4):
            p = _write(tmp_path / f"e{i}.png",
                       rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
            cache.put(p, rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
        blobs = list((tmp_path / "cache").glob("*.npy"))
        assert sum(b.stat().st_size for b in blobs) <= 1000
        assert len(blobs) < 4

    def test_loader_uses_decode_cache(self, tmp_path, rng):
        arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        p = _write(tmp_path / "c.png", arr)
        cfg = LoaderConfig(batch_size=1,
                           decode_cache_dir=str(tmp_path / "cache"))
        for _ in range(2):
            (batch,) = list(BatchLoader([p], cfg=cfg))
            np.testing.assert_array_equal(batch.images[0], arr)
        assert list((tmp_path / "cache").glob("*.npy"))

    def test_decode_failure_continues(self, tmp_path, rng):
        ok = _write(tmp_path / "ok.png",
                    rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
        bad = tmp_path / "bad.png"
        bad.write_bytes(b"not an image")
        loader = BatchLoader([ok, bad], cfg=LoaderConfig(batch_size=4))
        batches = list(loader)
        assert sum(len(b.paths) for b in batches) == 1
        assert len(loader.failures) == 1
        assert loader.failures[0].path == bad

    def test_bounded_inflight_decodes(self, rng):
        """Decodes are submitted in a sliding window, not all up front:
        with an unconsumed iterator, started decodes stay bounded by
        the prefetch depth regardless of directory size."""
        import threading
        import time

        n = 40
        started = []
        lock = threading.Lock()

        def decode(path):
            with lock:
                started.append(path)
            return np.zeros((4, 4, 3), dtype=np.uint8)

        cfg = LoaderConfig(batch_size=2, prefetch_batches=2,
                           decode_workers=4)
        loader = BatchLoader([f"img_{i}.png" for i in range(n)],
                             cfg=cfg, decode=decode)
        it = iter(loader)
        first = next(it)  # starts the producer, consumes one batch
        time.sleep(0.5)   # give the producer time to run unbounded if buggy
        window = max(2, cfg.prefetch_batches) * cfg.batch_size  # queue cap
        with lock:
            n_started = len(started)
        # consumed batch + queue capacity + in-flight window (+1 for the
        # result blocked on the full queue); far below n=40.
        assert n_started <= len(first.paths) + 2 * window + 1, n_started
        rest = list(it)
        assert len(first.paths) + sum(len(b.paths) for b in rest) == n


class TestManifest:
    def test_failed_overrides_done(self, tmp_path):
        from rgnir_tpu.utils.manifest import Manifest

        src = tmp_path / "a.png"
        src.write_bytes(b"x")
        m = Manifest(tmp_path / "m.jsonl")
        m.mark(src, "done")
        assert m.is_done(src)
        m.mark(src, "failed", error="write failed")
        assert not m.is_done(src)
        m.close()
        # Reload from disk: the later failed record still wins.
        m2 = Manifest(tmp_path / "m.jsonl")
        assert not m2.is_done(src)
        m2.close()


class TestWriter:
    def test_async_write_and_errors(self, tmp_path, rng):
        arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        w = AsyncWriter(workers=2)
        w.submit_array(tmp_path / "sub" / "a.png", arr)  # creates dirs
        errors = w.close()
        assert errors == []
        np.testing.assert_array_equal(
            np.asarray(Image.open(tmp_path / "sub" / "a.png")), arr
        )

    def test_submit_array_copies_before_encode(self, tmp_path, rng):
        """Mutating the buffer after submit must not corrupt the
        written file (regression: np.asarray aliased the caller's
        array)."""
        arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        snapshot = arr.copy()
        out = tmp_path / "w" / "frame.png"
        with AsyncWriter(1) as w:
            w.submit_array(out, arr)
            arr[:] = 0  # caller reuses the buffer immediately
        np.testing.assert_array_equal(np.asarray(Image.open(out)), snapshot)

    def test_encode_png_roundtrip(self, rng):
        import io as _io

        arr = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
        back = np.asarray(Image.open(_io.BytesIO(encode_png(arr))))
        np.testing.assert_array_equal(back, arr)


class TestVizSmoke:
    def test_figures_render(self, rng):
        from datetime import datetime

        from rgnir_tpu.viz import (
            render_change_figure,
            render_comparison_figure,
            render_histogram_figure,
            render_index_figure,
            render_time_series_figure,
        )

        idx = rng.uniform(-1, 1, (16, 16)).astype(np.float32)
        assert render_index_figure(idx, "NDVI").size[0] > 0
        fig, stats = render_comparison_figure(
            [{"filename": "a", "array": idx, "stats": {"Mean NDVI": 0.1}}],
            index_type="NDVI",
        )
        assert fig.size[0] > 0 and stats["a"]["Mean NDVI"] == 0.1
        dates = [datetime(2025, m, 1) for m in (1, 2, 3)]
        assert render_time_series_figure(
            dates, [0.1, 0.2, 0.3], [0.0, 0.1, 0.2], [0.2, 0.3, 0.4], "NDWI"
        ).size[0] > 0
        assert render_change_figure(idx, idx, idx * 0, "NDVI", "a", "b").size[0] > 0
        assert render_histogram_figure(
            np.arange(50), "NDVI"
        ).size[0] > 0

    def test_histogram_out_path_reuse_is_byte_identical(self, tmp_path):
        """The out_path route reuses one Agg figure with bar-height
        updates; its PNGs must be byte-identical to a from-scratch
        writer's for the same counts (the autoscale is recomputed from
        fresh data limits — this is the pin for that)."""
        import rgnir_tpu.viz.figures as figmod
        from rgnir_tpu.viz.figures import (
            _HistFigureWriter, render_histogram_figure,
        )

        rng = np.random.default_rng(3)
        h1 = rng.integers(0, 100000, 50)
        h2 = rng.integers(0, 5000, 50)   # very different y scale
        # reused writer: h1 then h2 then h1 again through one cache
        for i, h in enumerate((h1, h2, h1)):
            render_histogram_figure(h, "NDVI",
                                    out_path=tmp_path / f"r{i}.png")
        # fresh writer per render
        for i, h in enumerate((h1, h2)):
            _HistFigureWriter().save(
                h, figmod.IndexKind.NDVI, (-1.0, 1.0),
                tmp_path / f"f{i}.png",
            )
        assert (tmp_path / "r0.png").read_bytes() == (
            tmp_path / "f0.png").read_bytes()
        assert (tmp_path / "r1.png").read_bytes() == (
            tmp_path / "f1.png").read_bytes()
        assert (tmp_path / "r2.png").read_bytes() == (
            tmp_path / "f0.png").read_bytes()

    def test_lean_rgba_bit_equals_matplotlib_chain(self):
        """_lean_rgba must reproduce matplotlib's
        to_rgba -> _rgb_to_rgba float64 RGBA bit-for-bit, including
        NaN (bad), under- and over-range pixels — the exactness the
        replay draw's pixel-identity rests on."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.image as mi
        import matplotlib.pyplot as plt

        from rgnir_tpu.viz.figures import IndexFigureWriter

        fig, ax = plt.subplots()
        try:
            arr = np.random.default_rng(0).uniform(
                -1.3, 1.3, (48, 64)
            ).astype(np.float32)
            arr[3, 3] = np.nan
            im = ax.imshow(arr, cmap="RdYlGn", vmin=-1, vmax=1)
            lean = IndexFigureWriter._lean_rgba(im, arr)
            assert lean is not None
            rgba, had_bad = lean
            assert had_bad
            full = mi._rgb_to_rgba(im.to_rgba(arr)[..., :3])
            np.testing.assert_array_equal(rgba, full)
            assert rgba.dtype == np.float64
            # unsupported shapes fall back loudly (None), never guess
            assert IndexFigureWriter._lean_rgba(im, arr[None]) is None
            assert IndexFigureWriter._lean_rgba(
                im, np.nan_to_num(arr).astype(np.int32)
            ) is None
            # clip=True clamps BEFORE the cmap (different under/over
            # routing) — must fall back, not approximate
            import matplotlib.colors as mcolors

            im.set_norm(mcolors.Normalize(-1, 1, clip=True))
            assert IndexFigureWriter._lean_rgba(im, arr) is None
        finally:
            plt.close(fig)

    def test_index_figure_writer_pixel_parity(self, tmp_path, rng):
        """The reused-figure batch writer must render the exact pixels
        of the one-shot save_index_figure path, across repeated arrays
        and a mid-stream shape change."""
        from PIL import Image

        from rgnir_tpu.viz.figures import IndexFigureWriter, save_index_figure

        writer = IndexFigureWriter()
        arrays = [
            rng.uniform(-1, 1, (32, 32)).astype(np.float32),
            rng.uniform(-1, 1, (32, 32)).astype(np.float32),
            rng.uniform(-1, 1, (24, 40)).astype(np.float32),  # new layout
        ]
        for i, arr in enumerate(arrays):
            one_shot = tmp_path / f"one_{i}.png"
            reused = tmp_path / f"re_{i}.png"
            save_index_figure(arr, "NDVI", one_shot)
            writer.write(arr, "NDVI", reused)
            a = np.asarray(Image.open(one_shot).convert("RGB"))
            b = np.asarray(Image.open(reused).convert("RGB"))
            # one-shot saves RGBA with opaque alpha; the blit writer
            # saves RGB directly — pixel content must match exactly.
            assert np.asarray(Image.open(one_shot))[..., 3:].min(
                initial=255
            ) == 255
            assert a.shape == b.shape
            np.testing.assert_array_equal(a, b)

    def test_index_figure_writer_fast_draw_identity(self, tmp_path, rng):
        """The capture-replay fast draw (default) must be pixel-equal
        to the full draw_artist fallback, and the layout cache is
        process-global: a second writer reuses the first's layouts."""
        from PIL import Image

        from rgnir_tpu.viz.figures import IndexFigureWriter

        fast = IndexFigureWriter()
        slow = IndexFigureWriter()
        slow.fast_draw = False
        assert fast._state is slow._state  # shared class-level cache
        # Big enough that matplotlib picks the 'rgba' interpolation
        # stage (output/input < 3) — the shape the replay capture
        # supports; small arrays hit the 'data' stage and fall back to
        # the full draw (still pixel-identical, just uncaptured).
        arrays = [
            rng.uniform(-1, 1, (256, 320)).astype(np.float32),
            np.full((256, 320), 0.25, np.float32),  # constant (ties)
        ]
        for i, arr in enumerate(arrays):
            f, s = tmp_path / f"f{i}.png", tmp_path / f"s{i}.png"
            fast.write(arr, "NDWI", f)
            before = len(fast._state)
            slow.write(arr, "NDWI", s)
            assert len(slow._state) == before  # layout reused, not rebuilt
            np.testing.assert_array_equal(
                np.asarray(Image.open(f).convert("RGB")),
                np.asarray(Image.open(s).convert("RGB")),
            )
        # the fast path was actually active (replay state captured)
        key = ("NDWI", arrays[0].shape)
        assert fast._state[key][-1] is not None


class TestProfiling:
    def test_stage_timer(self):
        import time

        from rgnir_tpu.utils.profiling import StageTimer

        t = StageTimer()
        with t.stage("decode", pixels=1_000_000):
            time.sleep(0.01)
        with t.stage("decode", pixels=1_000_000):
            time.sleep(0.01)
        with t.stage("device"):
            pass
        rep = t.report()
        assert rep["decode"]["seconds"] >= 0.02
        assert rep["decode"]["mpix_per_s"] > 0
        assert "mpix_per_s" not in rep["device"]


class TestDebugging:
    def test_check_finite(self, rng):
        import jax.numpy as jnp
        import pytest as _pytest

        from rgnir_tpu.utils.debugging import check_finite, nonfinite_counts

        good = {"a": jnp.ones((4, 4)), "n": jnp.arange(3)}  # ints ignored
        check_finite(good)
        bad = {"a": jnp.array([1.0, jnp.nan, jnp.inf])}
        counts = nonfinite_counts(bad)
        assert sum(counts.values()) == 2
        with _pytest.raises(FloatingPointError, match="non-finite"):
            check_finite(bad, "stats")

    def test_pipeline_outputs_finite(self, rgnir_image):
        import jax.numpy as jnp

        from rgnir_tpu.pipeline.fused import analyze_image_jit
        from rgnir_tpu.utils.debugging import check_finite

        res = analyze_image_jit(jnp.asarray(rgnir_image))
        check_finite(res, "analyze_image")


class TestAutotuneCache:
    """Persistent block-size cache (utils/autotune.py)."""

    @pytest.fixture(autouse=True)
    def _tmp_cache(self, tmp_path, monkeypatch):
        from rgnir_tpu.utils import autotune

        monkeypatch.setenv(
            "RGNIR_TPU_AUTOTUNE_CACHE", str(tmp_path / "tune.json")
        )
        autotune.invalidate_cache()
        yield
        autotune.invalidate_cache()

    def test_roundtrip_and_bucketing(self):
        from rgnir_tpu.utils import autotune

        assert autotune.lookup_block_r("hist", 512 * 512) is None
        autotune.store_block_r("hist", 512 * 512, 64)
        assert autotune.lookup_block_r("hist", 512 * 512) == 64
        # same log2 bucket (2^18): shared entry
        assert autotune.lookup_block_r("hist", 200_000) == 64
        # different bucket / kernel: misses
        assert autotune.lookup_block_r("hist", 1024 * 1024) is None
        assert autotune.lookup_block_r("fused", 512 * 512) is None
        # persists across the in-process cache being dropped
        autotune.invalidate_cache()
        assert autotune.lookup_block_r("hist", 512 * 512) == 64
        # a store from a "fresh process" (no prior lookup) must MERGE
        # with the file, not clobber other buckets (regression: a tune
        # run for new sizes wiped previously tuned entries)
        autotune.invalidate_cache()
        autotune.store_block_r("fused", 1024 * 1024, 16)
        assert autotune.lookup_block_r("hist", 512 * 512) == 64
        assert autotune.lookup_block_r("fused", 1024 * 1024) == 16

    def test_packaged_seed_used_when_user_cache_misses(self, monkeypatch):
        """The shipped autotune_seed.json supplies winners when the
        user cache lacks a key (keeps cold-machine trace-time block
        choices aligned with the committed compile cache); a user's
        own tune run overrides it."""
        from rgnir_tpu.utils import autotune

        key = f"{autotune._device_kind()}/hist/b18"
        monkeypatch.setattr(autotune, "_seed", lambda: {key: 48})
        autotune.invalidate_cache()
        assert autotune.lookup_block_r("hist", 512 * 512) == 48
        autotune.store_block_r("hist", 512 * 512, 64)
        autotune.invalidate_cache()
        assert autotune.lookup_block_r("hist", 512 * 512) == 64

    def test_store_never_persists_seed_entries(self, monkeypatch):
        """Regression (code review, 2026-08-18): store_block_r must
        write only USER-originated keys — persisting the merged view
        froze the packaged seed values into the user file, where they
        would shadow every future seed update."""
        import json
        from pathlib import Path

        from rgnir_tpu.utils import autotune

        seed_key = f"{autotune._device_kind()}/fused/b20"
        monkeypatch.setattr(autotune, "_seed", lambda: {seed_key: 16})
        autotune.invalidate_cache()
        assert autotune.lookup_block_r("fused", 1024 * 1024) == 16
        autotune.store_block_r("hist", 512 * 512, 64)
        on_disk = json.loads(Path(autotune.cache_path()).read_text())
        assert seed_key not in on_disk
        assert list(on_disk) == [f"{autotune._device_kind()}/hist/b18"]
        # merged view still serves both
        assert autotune.lookup_block_r("fused", 1024 * 1024) == 16
        assert autotune.lookup_block_r("hist", 512 * 512) == 64

    def test_shipped_seed_parses(self):
        """The committed seed must parse and hold int winners for the
        known TPU device kind (a malformed seed silently reverts cold
        machines to heuristic blocks — and a full recompile)."""
        from rgnir_tpu.utils import autotune

        seed = autotune._seed()
        assert seed, "autotune_seed.json missing or unparseable"
        assert all(
            isinstance(v, int) and v % 8 == 0 for v in seed.values()
        )
        assert any(k.startswith("TPU_v5_lite/") for k in seed)

    def test_corrupt_cache_file_falls_back_to_heuristic(self):
        """Any malformed cache content must read as empty, never crash
        dispatch (lookup runs on every default-block kernel call)."""
        from pathlib import Path

        from rgnir_tpu.utils import autotune

        path = Path(autotune.cache_path())
        path.parent.mkdir(parents=True, exist_ok=True)
        for bad in ("[1, 2]", '{"k": null}', "not json", '"str"'):
            path.write_text(bad)
            autotune.invalidate_cache()
            assert autotune.lookup_block_r("hist", 512 * 512) is None

    def test_auto_block_r_consults_cache(self):
        from rgnir_tpu.kernels.hist import auto_block_r
        from rgnir_tpu.utils import autotune

        n = 512 * 512
        base = auto_block_r(n, kernel="hist")
        autotune.store_block_r("hist", n, 128)
        assert auto_block_r(n, kernel="hist") == 128
        # the measured winner overrides the heuristic cap too (the
        # tuner only stores candidates that compiled on this device)
        assert auto_block_r(n, cap=32, kernel="hist") == 128
        # no kernel tag -> heuristic untouched
        assert auto_block_r(n) == base

    def test_fused_variant_split_consults_distinct_keys(self, rng):
        """The fused kernel's block choice is keyed by the histogram
        flag (hist-on and hist-off have different VMEM ceilings —
        BENCHMARKS.md round-4 re-tune): a tuned ``fused`` winner must
        steer only with_hist=False calls, ``fused_hist`` only
        with_hist=True, and K>3 custom-kind calls must ignore the
        K<=3-tuned ``fused`` winner entirely (working set scales with
        K). Pinned via the kernels' actual grid: grid steps =
        rows / block_r."""
        import jax.numpy as jnp

        from rgnir_tpu.config import IndexKind, register_index
        from rgnir_tpu.kernels.fused import fused_analyze_pallas
        from rgnir_tpu.utils import autotune

        h = w = 128  # 16384 px -> 16 rows
        n = h * w
        autotune.store_block_r("fused", n, 16)
        autotune.store_block_r("fused_hist", n, 8)
        img = jnp.asarray(rng.integers(0, 256, (3, h, w), dtype=np.uint8))
        lo = jnp.zeros(3, jnp.float32)
        hi = jnp.full(3, 255.0, jnp.float32)

        def grid_steps(**kw):
            import unittest.mock as mock

            from rgnir_tpu.kernels import fused as fused_mod

            real = fused_mod.auto_block_r
            calls = []

            def spy(*a, **k):
                r = real(*a, **k)
                calls.append((k.get("kernel"), r))
                return r

            with mock.patch.object(fused_mod, "auto_block_r", spy):
                fused_analyze_pallas(img, lo, hi, **kw)
            return calls

        three = (IndexKind.NDVI, IndexKind.GNDVI, IndexKind.NDWI)
        assert grid_steps(kinds=three, with_hist=False) == [("fused", 16)]
        assert grid_steps(kinds=three, with_hist=True) == [
            ("fused_hist", 8)
        ]
        # K>3: no tuned lookup (kernel tag omitted -> heuristic only;
        # the stored fused winner was measured at K<=3)
        register_index("BLKT1", (2, 0))
        register_index("BLKT2", (2, 1))
        five = three + (
            IndexKind.parse("BLKT1"), IndexKind.parse("BLKT2")
        )
        assert grid_steps(kinds=five, with_hist=False) == [(None, 16)]

    def test_kernel_accepts_cached_block(self, rng):
        """The hist kernel runs with a cache-provided block size and
        keeps exact counts."""
        import jax.numpy as jnp

        from rgnir_tpu.kernels.hist import planar_histograms_pallas
        from rgnir_tpu.utils import autotune

        img = rng.integers(0, 256, (3, 64, 48), dtype=np.uint8)
        want = np.stack([
            np.bincount(img[c].ravel(), minlength=256) for c in range(3)
        ])
        autotune.store_block_r("hist", 64 * 48, 16)
        got = np.asarray(planar_histograms_pallas(jnp.asarray(img)))
        np.testing.assert_array_equal(got, want)

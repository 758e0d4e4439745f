"""Streamed gigapixel band reduction == the in-HBM path, exactly.

The joint-histogram closure (pipeline/gigapixel.py) claims BIT-EXACT
value-level statistics (min/max/median, 50-bin histogram, WB bounds)
and float64-or-better mean/std versus running WB -> index -> stats on
the whole image in memory. These tests check that on the actual op
implementations (not reimplementations), at awkward sizes that
exercise chunk padding, multi-band splits, and the transpose-shared
joint histogram.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rgnir_tpu.config import IndexKind, WBConfig
from rgnir_tpu.ops.indices import compute_index
from rgnir_tpu.ops.stats import index_stats
from rgnir_tpu.ops.wb import white_balance
from rgnir_tpu.pipeline import gigapixel
from rgnir_tpu.pipeline.gigapixel import (
    analyze_mosaic_streamed, iter_row_bands,
)


@pytest.fixture(autouse=True)
def small_chunk(monkeypatch):
    # The (chunk, 256) one-hot contraction is sized for the MXU; on the
    # CPU test platform shrink it so tests run in seconds. Padding and
    # multi-chunk paths are exercised MORE this way, not less.
    monkeypatch.setattr(gigapixel, "_CHUNK", 4096)


def _mosaic(rng, h, w):
    # Structured + noisy content so percentiles/medians are nontrivial.
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 110 + 70 * np.sin(xx / 13.0) + 50 * np.cos(yy / 7.0)
    img = np.stack(
        [base, 0.7 * base + 30, 1.2 * base - 10], axis=-1
    ) + rng.normal(0, 25, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def _reference_stats(img, kind, with_wb=True):
    x = jnp.asarray(img)
    if with_wb:
        x = white_balance(x)
    idx = compute_index(x, kind)
    return index_stats(idx, kind)


class TestShardedStream:
    """mesh= shards each band's pixel axis across devices; the psum'd
    integer joint histograms must be BIT-identical to the unsharded
    reduction (integer adds commute), at awkward row counts that
    exercise both the shard pad and each shard's chunk pad."""

    def test_sharded_matches_unsharded(self, rng):
        from rgnir_tpu.parallel.mesh import make_mesh

        img = _mosaic(rng, 131, 97)  # 131*97 odd vs 8 shards and chunk
        mesh = make_mesh((8,), ("d",))
        plain = analyze_mosaic_streamed(
            img, kinds=("NDVI", "NDWI"), band_rows=37
        )
        shard = analyze_mosaic_streamed(
            img, kinds=("NDVI", "NDWI"), band_rows=37, mesh=mesh
        )
        assert shard.n_pixels == plain.n_pixels == 131 * 97
        for k in ("NDVI", "NDWI"):
            for f in ("mean", "median", "std", "min", "max",
                      "coverage_pct"):
                assert float(getattr(shard.stats[k], f)) == float(
                    getattr(plain.stats[k], f)
                ), (k, f)
            np.testing.assert_array_equal(
                shard.stats[k].histogram, plain.stats[k].histogram
            )
        np.testing.assert_array_equal(
            np.asarray(shard.wb_lo), np.asarray(plain.wb_lo)
        )

    def test_mesh_rejects_host_reduce_and_2d(self, rng):
        from rgnir_tpu.parallel.mesh import make_mesh

        img = _mosaic(rng, 16, 16)
        with pytest.raises(ValueError, match="reduce='device'"):
            analyze_mosaic_streamed(
                img, mesh=make_mesh((8,), ("d",)), reduce="host"
            )
        with pytest.raises(ValueError, match="1-D mesh"):
            analyze_mosaic_streamed(
                img, mesh=make_mesh((4, 2), ("a", "b"))
            )


class TestStreamedExactness:
    @pytest.mark.parametrize("kind", ["NDVI", "GNDVI", "NDWI"])
    def test_matches_in_memory_path(self, rng, kind):
        img = _mosaic(rng, 123, 157)  # odd sizes: chunk padding active
        res = analyze_mosaic_streamed(img, kinds=(kind,), band_rows=40)
        ref = _reference_stats(img, kind)
        got = res.stats[kind]
        # Value-level stats: bit-exact (same f32 value multiset).
        assert float(got.min) == float(ref.min)
        assert float(got.max) == float(ref.max)
        assert float(got.median) == float(ref.median)
        np.testing.assert_array_equal(
            np.asarray(got.histogram, dtype=np.int64),
            np.asarray(ref.histogram, dtype=np.int64),
        )
        assert int(got.n) == int(ref.n)
        # Accumulated moments: streamed is f64-summed, device is f32.
        np.testing.assert_allclose(float(got.mean), float(ref.mean), atol=2e-6)
        np.testing.assert_allclose(float(got.std), float(ref.std), atol=2e-6)
        np.testing.assert_allclose(
            float(got.coverage_pct), float(ref.coverage_pct), atol=1e-4
        )

    def test_chunk_resize_between_runs_stays_exact(self, rng, monkeypatch):
        """The joint-hist jit must key on the chunk size.

        A trace-time read of the module-global ``_CHUNK`` let an
        executable cached under one chunk size serve a same-shape call
        under another, while the caller's ``-n % _CHUNK`` pad
        accounting used the new value — silently corrupting bin [0, 0]
        (surfaced as a test-order coupling: the custom-index suite's
        streamed run poisoned this file's NDVI exactness test, since
        both compact to the same (N, 2) wire shape and pair key).
        """
        img = _mosaic(rng, 123, 157)
        ref = _reference_stats(img, "NDVI")
        for chunk in (1 << 17, 4096):  # same shapes, different chunk
            monkeypatch.setattr(gigapixel, "_CHUNK", chunk)
            res = analyze_mosaic_streamed(img, kinds=("NDVI",), band_rows=40)
            got = res.stats["NDVI"]
            assert float(got.min) == float(ref.min), chunk
            assert float(got.max) == float(ref.max), chunk
            assert float(got.median) == float(ref.median), chunk
            np.testing.assert_array_equal(
                np.asarray(got.histogram, dtype=np.int64),
                np.asarray(ref.histogram, dtype=np.int64),
                err_msg=str(chunk),
            )
            assert int(got.n) == int(ref.n), chunk

    def test_three_kinds_one_pass_shares_transposed_hist(self, rng):
        img = _mosaic(rng, 96, 120)
        res = analyze_mosaic_streamed(
            img, kinds=("NDVI", "GNDVI", "NDWI"), band_rows=33
        )
        for kind in ("NDVI", "GNDVI", "NDWI"):
            ref = _reference_stats(img, kind)
            got = res.stats[kind]
            assert float(got.median) == float(ref.median), kind
            assert float(got.min) == float(ref.min), kind
            np.testing.assert_allclose(
                float(got.mean), float(ref.mean), atol=2e-6, err_msg=kind
            )

    def test_wb_bounds_match_full_histogram(self, rng):
        from rgnir_tpu.ops.histogram import channel_histograms
        from rgnir_tpu.ops.wb import wb_bounds_from_histogram

        img = _mosaic(rng, 77, 91)
        res = analyze_mosaic_streamed(img, kinds=("NDVI",), band_rows=19)
        hist = channel_histograms(jnp.asarray(img))
        lo, hi = wb_bounds_from_histogram(
            hist, n=img.shape[0] * img.shape[1], cfg=WBConfig()
        )
        for ch in (0, 2):  # NDVI references R and NIR
            assert res.wb_lo[ch] == float(lo[ch])
            assert res.wb_hi[ch] == float(hi[ch])
        assert np.isnan(res.wb_lo[1])  # G never referenced

    def test_band_iterable_equals_array_slicing(self, rng):
        img = _mosaic(rng, 101, 64)

        def gen():
            yield img[:37]
            yield img[37:38]
            yield img[38:]

        a = analyze_mosaic_streamed(img, kinds=("NDVI",), band_rows=50)
        b = analyze_mosaic_streamed(gen(), kinds=("NDVI",))
        for field in ("mean", "median", "std", "min", "max", "coverage_pct"):
            assert float(getattr(a.stats["NDVI"], field)) == float(
                getattr(b.stats["NDVI"], field)
            ), field
        assert b.bands == 3

    def test_without_wb(self, rng):
        img = _mosaic(rng, 60, 80)
        res = analyze_mosaic_streamed(
            img, kinds=("NDVI",), band_rows=60, with_wb=False
        )
        ref = _reference_stats(img, "NDVI", with_wb=False)
        assert float(res.stats["NDVI"].median) == float(ref.median)
        np.testing.assert_allclose(
            float(res.stats["NDVI"].mean), float(ref.mean), atol=2e-6
        )

    def test_memmap_streams_from_disk(self, rng, tmp_path):
        img = _mosaic(rng, 90, 70)
        p = tmp_path / "mosaic.dat"
        mm = np.memmap(p, dtype=np.uint8, mode="w+", shape=img.shape)
        mm[:] = img
        mm.flush()
        ro = np.memmap(p, dtype=np.uint8, mode="r", shape=img.shape)
        res = analyze_mosaic_streamed(ro, kinds=("NDVI",), band_rows=32)
        ref = _reference_stats(img, "NDVI")
        assert float(res.stats["NDVI"].median) == float(ref.median)

    def test_rejects_bad_band(self, rng):
        with pytest.raises(ValueError, match="uint8"):
            analyze_mosaic_streamed(
                iter([np.zeros((4, 4, 3), np.float32)]), kinds=("NDVI",)
            )
        with pytest.raises(ValueError, match="no bands"):
            analyze_mosaic_streamed(iter([]), kinds=("NDVI",))

    def test_iter_row_bands_views(self, rng):
        img = _mosaic(rng, 10, 8)
        bands = list(iter_row_bands(img, 4))
        assert [b.shape[0] for b in bands] == [4, 4, 2]
        assert bands[0].base is img  # no copies


class TestHostReduce:
    """reduce='host' (native jointhist accumulator / numpy fallback)
    must be BIT-identical to the device MXU reduction — both feed the
    same 65536-bin closure."""

    @pytest.mark.parametrize("kinds", [
        ("NDVI",), ("NDVI", "GNDVI", "NDWI"),
    ])
    def test_identical_to_device_reduce(self, rng, kinds):
        img = _mosaic(rng, 123, 157)
        dev = analyze_mosaic_streamed(img, kinds=kinds, band_rows=40)
        host = analyze_mosaic_streamed(
            img, kinds=kinds, band_rows=40, reduce="host"
        )
        for k in kinds:
            a, b = dev.stats[k], host.stats[k]
            for field in ("mean", "median", "std", "min", "max",
                          "coverage_pct", "n"):
                assert getattr(a, field) == getattr(b, field), (k, field)
            np.testing.assert_array_equal(a.histogram, b.histogram)
        np.testing.assert_array_equal(
            np.nan_to_num(dev.wb_lo), np.nan_to_num(host.wb_lo)
        )
        np.testing.assert_array_equal(
            np.nan_to_num(dev.wb_hi), np.nan_to_num(host.wb_hi)
        )

    def test_host_reduce_matches_in_memory_path(self, rng):
        img = _mosaic(rng, 67, 91)
        res = analyze_mosaic_streamed(
            img, kinds=("NDVI",), band_rows=16, reduce="host"
        )
        ref = _reference_stats(img, "NDVI")
        got = res.stats["NDVI"]
        assert got.min == ref.min and got.max == ref.max
        assert got.median == ref.median

    def test_rejects_unknown_reduce(self, rng):
        with pytest.raises(ValueError, match="reduce"):
            analyze_mosaic_streamed(
                _mosaic(rng, 8, 8), kinds=("NDVI",), reduce="gpu"
            )

    @pytest.mark.parametrize("reduce", ["device", "host"])
    def test_oversized_band_is_resplit_exactly(
        self, rng, monkeypatch, reduce
    ):
        """A caller band above the exact-accumulation window must be
        re-split into row sub-bands (never silently wrap an int32 /
        uint32 accumulator). Shrunk window so a test-sized band
        triggers the split; stats must equal the small-band run."""
        img = _mosaic(rng, 64, 48)
        ref = analyze_mosaic_streamed(
            img, kinds=("NDVI",), band_rows=8, reduce=reduce
        )
        monkeypatch.setattr(gigapixel, "_FLUSH_AT", 1000)  # < 64*48
        got = analyze_mosaic_streamed(
            iter([img]), kinds=("NDVI",), reduce=reduce
        )
        a, b = ref.stats["NDVI"], got.stats["NDVI"]
        assert a.mean == b.mean and a.median == b.median
        np.testing.assert_array_equal(a.histogram, b.histogram)
        assert got.bands > 1  # the split actually happened

    def test_band_row_wider_than_window_raises(self, rng, monkeypatch):
        monkeypatch.setattr(gigapixel, "_FLUSH_AT", 100)
        with pytest.raises(ValueError, match="accumulation window"):
            analyze_mosaic_streamed(
                _mosaic(rng, 2, 200), kinds=("NDVI",), reduce="host"
            )

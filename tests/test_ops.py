"""Golden tests: device ops vs NumPy reference semantics (SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgnir_tpu import (
    IndexKind,
    white_balance,
    compute_index,
    index_stats,
    render_colormap,
    channel_histograms,
    percentiles_from_histogram,
)
from rgnir_tpu.ops.stats import to_analyze_index_dict, to_ndvi_report_dict
from rgnir_tpu.pipeline.fused import analyze_image_jit

import golden

ALL = ["NDVI", "GNDVI", "NDWI"]


class TestHistogram:
    def test_channel_histograms_exact(self, rgnir_image):
        hist = np.asarray(channel_histograms(jnp.asarray(rgnir_image)))
        for c in range(3):
            expected = np.bincount(rgnir_image[..., c].ravel(), minlength=256)
            np.testing.assert_array_equal(hist[c], expected)

    def test_histogram_batched(self, rgnir_batch):
        hist = np.asarray(channel_histograms(jnp.asarray(rgnir_batch)))
        assert hist.shape == (4, 3, 256)
        for b in range(4):
            for c in range(3):
                np.testing.assert_array_equal(
                    hist[b, c],
                    np.bincount(rgnir_batch[b, ..., c].ravel(), minlength=256),
                )

    def test_histogram_masked(self, rgnir_image):
        h, w, _ = rgnir_image.shape
        mask = np.zeros((h, w), bool)
        mask[: h // 2] = True
        hist = np.asarray(
            channel_histograms(jnp.asarray(rgnir_image), mask=jnp.asarray(mask))
        )
        for c in range(3):
            np.testing.assert_array_equal(
                hist[c],
                np.bincount(rgnir_image[: h // 2, :, c].ravel(), minlength=256),
            )

    # The reference uses array-q np.percentile (float64 path,
    # process-images.py:437); the device lerp is float32, so parity is
    # <=1 f32 ulp of values <=255.
    ULP255 = 255 * 1.3e-7

    @pytest.mark.parametrize("q", [0.0, 2.0, 50.0, 98.0, 100.0, 33.3])
    def test_percentile_parity(self, rng, q):
        """np.percentile (linear, array-q/f64 model) parity from the
        256-bin histogram."""
        for size in [97, 1000, 4096]:
            vals = rng.integers(0, 256, size=size).astype(np.uint8)
            hist = jnp.asarray(np.bincount(vals, minlength=256).astype(np.int32))
            got = float(percentiles_from_histogram(hist, (q,), n=size)[0])
            want = float(np.percentile(vals.astype(np.float32), [q])[0])
            assert got == pytest.approx(want, abs=self.ULP255), (q, size)

    def test_percentile_skewed(self):
        """Heavy ties (the uint8 regime that makes sorting-free exactness matter)."""
        vals = np.concatenate(
            [np.zeros(5000), np.full(100, 128), np.full(3, 255)]
        ).astype(np.uint8)
        hist = jnp.asarray(np.bincount(vals, minlength=256).astype(np.int32))
        for q in (2.0, 50.0, 98.0, 99.9):
            got = float(percentiles_from_histogram(hist, (q,), n=vals.size)[0])
            want = float(np.percentile(vals.astype(np.float32), [q])[0])
            assert got == pytest.approx(want, abs=self.ULP255), q

    def test_percentile_large_n_gamma_precision(self):
        """At 16 MPix the scalar-q numpy model's f32 virtual index is off
        by up to 0.125 in gamma; our trace-time f64 gamma must not be.
        Construct a histogram where the 98th percentile interpolates
        between two adjacent order statistics with a known f64 gamma."""
        n = 16_777_216  # 4096 x 4096
        hist = np.zeros(256, np.int64)
        k = int(np.floor(0.98 * (n - 1)))
        hist[10] = k + 1          # a[k] = 10
        hist[200] = n - (k + 1)   # a[k+1] = 200
        got = float(
            percentiles_from_histogram(
                jnp.asarray(hist.astype(np.int32)), (98.0,), n=n
            )[0]
        )
        d = 0.98 * (n - 1) - k
        want = 200.0 - (200.0 - 10.0) * (1.0 - d)  # numpy two-sided lerp
        assert got == pytest.approx(want, abs=self.ULP255)


class TestWhiteBalance:
    def test_vs_reference(self, rgnir_image):
        """Parity contract: XLA f32 division is within 1 ulp of IEEE, so
        the uint8 floor can flip by +/-1 only where the stretched value
        sits within ~3e-5 of an integer — measured <0.1% of pixels."""
        got = np.asarray(white_balance(jnp.asarray(rgnir_image)))
        ref = golden.golden_white_balance(rgnir_image)
        diff = np.abs(got.astype(int) - ref.astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-3

    def test_batched_independent(self, rgnir_batch):
        got = np.asarray(white_balance(jnp.asarray(rgnir_batch)))
        for b in range(4):
            single = np.asarray(white_balance(jnp.asarray(rgnir_batch[b])))
            np.testing.assert_array_equal(got[b], single)

    def test_float_input_via_radix_quantiles(self, rng):
        """Beyond the reference: float images use radix-select percentiles."""
        f = rng.uniform(0, 1000, (40, 48, 3)).astype(np.float32)
        got = np.asarray(white_balance(jnp.asarray(f)))
        corrected = np.zeros_like(f)
        for c in range(3):
            ch = f[..., c]
            p2, p98 = np.percentile(ch, (2, 98))
            corrected[..., c] = np.clip((ch - p2) / (p98 - p2) * 255, 0, 255)
        want = corrected.astype(np.uint8)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    def test_gray_world_equalizes_means(self, rgnir_image):
        from rgnir_tpu.ops.wb import gray_world_balance

        out = np.asarray(gray_world_balance(jnp.asarray(rgnir_image)))
        assert out.dtype == np.uint8
        means = out.reshape(-1, 3).mean(axis=0)
        # channel means equalized to within clip/rounding effects
        assert means.std() / means.mean() < 0.03
        # reference check against the textbook formula
        x = rgnir_image.astype(np.float32)
        m = x.reshape(-1, 3).mean(axis=0)
        want = np.clip(x * (m.mean() / m), 0, 255).astype(np.uint8)
        diff = np.abs(out.astype(int) - want.astype(int))
        assert diff.max() <= 1

    def test_gray_world_masked(self, rgnir_image):
        from rgnir_tpu.ops.wb import gray_world_balance

        h, w, _ = rgnir_image.shape
        mask = np.zeros((h, w), bool)
        mask[: h // 2] = True
        out_m = np.asarray(
            gray_world_balance(
                jnp.asarray(rgnir_image), mask=jnp.asarray(mask),
                n_valid=int(mask.sum()),
            )
        )
        out_c = np.asarray(
            gray_world_balance(jnp.asarray(rgnir_image[: h // 2]))
        )
        np.testing.assert_array_equal(out_m[: h // 2], out_c)

    def test_constant_channel_no_nan(self):
        img = np.full((16, 16, 3), 7, np.uint8)
        got = np.asarray(white_balance(jnp.asarray(img)))
        assert got.dtype == np.uint8  # reference would NaN here; we define 0
        np.testing.assert_array_equal(got, 0)


class TestIndices:
    ULP = 1.2e-7  # 1 ulp at |x| ~ 1: XLA f32 division vs IEEE

    @pytest.mark.parametrize("kind", ALL)
    def test_vs_reference_1ulp(self, rgnir_image, kind):
        got = np.asarray(compute_index(jnp.asarray(rgnir_image), kind))
        ref = golden.golden_index(rgnir_image, kind)
        np.testing.assert_allclose(got, ref, atol=self.ULP, rtol=0)

    def test_unknown_kind_raises(self, rgnir_image):
        with pytest.raises(ValueError, match="Unknown index type"):
            compute_index(jnp.asarray(rgnir_image), "EVI")

    def test_range(self, rgnir_batch):
        for kind in ALL:
            idx = np.asarray(compute_index(jnp.asarray(rgnir_batch), kind))
            assert idx.min() >= -1.0 and idx.max() <= 1.0
            assert idx.dtype == np.float32

    def test_ndwi_is_negated_gndvi(self, rgnir_image):
        """(G - NIR) == -(NIR - G) given the same denominator."""
        g = np.asarray(compute_index(jnp.asarray(rgnir_image), "GNDVI"))
        w = np.asarray(compute_index(jnp.asarray(rgnir_image), "NDWI"))
        np.testing.assert_allclose(w, -g, atol=1e-7)


class TestStats:
    @pytest.mark.parametrize("kind", ALL)
    def test_analyze_index_parity(self, rgnir_image, kind):
        idx = golden.golden_index(rgnir_image, kind)
        st = index_stats(jnp.asarray(idx), kind)
        got = to_analyze_index_dict(st, kind)
        want = golden.golden_analyze_index(idx, kind)
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-5), k

    def test_ndvi_report_parity(self, rgnir_image):
        ndvi = golden.golden_index(rgnir_image, "NDVI")
        st = index_stats(jnp.asarray(ndvi), "NDVI")
        got = to_ndvi_report_dict(st)
        want = golden.golden_ndvi_statistics(ndvi)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-5), k

    def test_histogram_50bin_parity(self, rgnir_image):
        ndvi = golden.golden_index(rgnir_image, "NDVI")
        st = index_stats(jnp.asarray(ndvi), "NDVI")
        np.testing.assert_array_equal(
            np.asarray(st.histogram), golden.golden_histogram(ndvi)
        )

    def test_batched_median_per_image(self, rgnir_batch):
        """Regression: batched stats must give per-image medians, not one
        median over the whole batch."""
        idx = golden.golden_index(rgnir_batch, "NDVI")
        st = index_stats(jnp.asarray(idx), "NDVI")
        assert st.median.shape == (4,)
        for b in range(4):
            assert float(st.median[b]) == float(np.median(idx[b])), b

    def test_median_even_odd(self, rng):
        for h, w in [(5, 5), (4, 4)]:
            x = rng.normal(size=(h, w)).astype(np.float32).clip(-1, 1)
            st = index_stats(jnp.asarray(x), "NDVI")
            assert float(st.median) == pytest.approx(float(np.median(x)), abs=1e-7)

    def test_masked_stats_equal_crop(self, rgnir_image):
        idx = golden.golden_index(rgnir_image, "NDVI")
        h, w = idx.shape
        mask = np.zeros((h, w), bool)
        mask[: h // 2, : w // 2] = True
        n = int(mask.sum())
        st_m = index_stats(jnp.asarray(idx), "NDVI", mask=jnp.asarray(mask), n_valid=n)
        st_c = index_stats(jnp.asarray(idx[: h // 2, : w // 2]), "NDVI")
        for field in ("mean", "median", "std", "min", "max", "coverage_pct"):
            assert float(getattr(st_m, field)) == pytest.approx(
                float(getattr(st_c, field)), abs=1e-6
            ), field
        np.testing.assert_array_equal(
            np.asarray(st_m.histogram), np.asarray(st_c.histogram)
        )


class TestColormap:
    @pytest.mark.parametrize("kind", ALL)
    def test_vs_matplotlib(self, rgnir_image, kind):
        idx = golden.golden_index(rgnir_image, kind)
        got = np.asarray(render_colormap(jnp.asarray(idx), kind, alpha=True))
        want = golden.golden_colormap_rgba(
            idx, "RdYlBu" if kind == "NDWI" else "RdYlGn"
        )
        # f32 vs f64 bin edges can flip a pixel into the adjacent LUT
        # entry; require exact match on >99.9% and near-match elsewhere.
        exact = (got == want).all(axis=-1)
        assert exact.mean() > 0.999
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 8

    def test_change_map_bwr(self, rng):
        diff = rng.uniform(-0.5, 0.5, size=(32, 32)).astype(np.float32)
        got = np.asarray(
            render_colormap(jnp.asarray(diff), "bwr", vmin=-0.5, vmax=0.5, alpha=True)
        )
        want = golden.golden_colormap_rgba(diff, "bwr", vmin=-0.5, vmax=0.5)
        exact = (got == want).all(axis=-1)
        assert exact.mean() > 0.999


class TestFusedPipeline:
    def test_end_to_end_single(self, rgnir_image):
        res = analyze_image_jit(jnp.asarray(rgnir_image))
        ref_wb = golden.golden_white_balance(rgnir_image)
        wb = np.asarray(res.wb)
        diff = np.abs(wb.astype(int) - ref_wb.astype(int))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3
        for kind in ALL:
            # golden continues from the device WB so per-stage parity
            # composes (WB boundary flips are checked above).
            ref_idx = golden.golden_index(wb, kind)
            np.testing.assert_allclose(
                np.asarray(res.indices[kind]), ref_idx, atol=1.2e-7, rtol=0
            )
            want = golden.golden_analyze_index(ref_idx, kind)
            got = to_analyze_index_dict(res.stats[kind], kind)
            for k in want:
                assert got[k] == pytest.approx(want[k], abs=2e-2), (kind, k)
            assert res.renders[kind].shape == ref_idx.shape + (3,)

    def test_end_to_end_batch(self, rgnir_batch):
        res = analyze_image_jit(jnp.asarray(rgnir_batch), kinds=("NDVI",))
        assert res.wb.shape == rgnir_batch.shape
        assert res.indices["NDVI"].shape == rgnir_batch.shape[:3]
        assert res.stats["NDVI"].mean.shape == (4,)

    def test_no_wb_path(self, rgnir_image):
        """process-ndvi.py computes NDVI on the raw image (lines 17-31)."""
        res = analyze_image_jit(
            jnp.asarray(rgnir_image), kinds=("NDVI",), with_wb=False
        )
        ref = golden.golden_index(rgnir_image, "NDVI")
        np.testing.assert_allclose(
            np.asarray(res.indices["NDVI"]), ref, atol=1.2e-7, rtol=0
        )


class TestLutBakeDrift:
    def test_rebaking_reproduces_committed_luts(self):
        """The committed _generated_luts must match what _bake produces
        against the installed matplotlib — catches silent colormap
        drift across matplotlib versions (the byte-parity contract of
        ops.colormap depends on these exact tables)."""
        import importlib

        pytest.importorskip("matplotlib")
        from rgnir_tpu.color import _bake, _generated_luts

        src = _bake.bake()
        ns: dict = {}
        exec(compile(src, "<baked>", "exec"), ns)
        for name in _bake.CMAPS:
            np.testing.assert_array_equal(
                ns["LUTS"][name], _generated_luts.LUTS[name],
                err_msg=f"LUT drift for {name}",
            )

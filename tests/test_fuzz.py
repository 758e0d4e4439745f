"""Fuzz tests: exactness contracts must hold across many random shapes,
distributions, and degenerate inputs — not just the fixture image."""

import numpy as np
import jax.numpy as jnp
import pytest

import golden
from rgnir_tpu import white_balance, compute_index, index_stats
from rgnir_tpu.ops.histogram import (
    channel_histograms,
    nibble_product_histogram,
    percentiles_from_histogram,
)
from rgnir_tpu.ops.stats import to_analyze_index_dict


def _random_image(rng):
    h = int(rng.integers(3, 130))
    w = int(rng.integers(3, 130))
    style = rng.integers(0, 4)
    if style == 0:  # uniform noise
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if style == 1:  # low dynamic range (stresses percentile ties)
        return rng.integers(100, 110, (h, w, 3), dtype=np.uint8)
    if style == 2:  # saturated blocks
        img = np.zeros((h, w, 3), np.uint8)
        img[: h // 2] = 255
        img[h // 2:, :, 1] = rng.integers(0, 256, img[h // 2:, :, 1].shape)
        return img
    # smooth gradient + noise
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([xx, yy, xx + yy], -1)
    base = base / max(base.max(), 1) * 255
    return np.clip(
        base + rng.normal(0, 10, (h, w, 3)), 0, 255
    ).astype(np.uint8)


class TestFuzzExactness:
    def test_wb_and_stats_parity_sweep(self, rng):
        for trial in range(20):
            img = _random_image(rng)
            got_wb = np.asarray(white_balance(jnp.asarray(img)))
            want_wb = golden.golden_white_balance(img)
            diff = np.abs(got_wb.astype(int) - want_wb.astype(int))
            assert diff.max() <= 1, trial
            assert (diff > 0).mean() < 2e-3, trial

            idx = golden.golden_index(got_wb, "NDVI")
            st = index_stats(jnp.asarray(idx), "NDVI")
            want = golden.golden_analyze_index(idx, "NDVI")
            got = to_analyze_index_dict(st, "NDVI")
            assert got["Median NDVI"] == want["Median NDVI"], trial
            assert got["Min NDVI"] == want["Min NDVI"], trial
            assert got["Max NDVI"] == want["Max NDVI"], trial
            assert got["Mean NDVI"] == pytest.approx(
                want["Mean NDVI"], abs=1e-5
            ), trial
            np.testing.assert_array_equal(
                np.asarray(st.histogram), golden.golden_histogram(idx),
                err_msg=f"trial {trial}",
            )

    def test_percentile_parity_sweep(self, rng):
        for trial in range(30):
            n = int(rng.integers(1, 5000))
            vals = rng.integers(0, 256, n).astype(np.uint8)
            hist = jnp.asarray(np.bincount(vals, minlength=256).astype(np.int32))
            qs = sorted(rng.uniform(0, 100, size=3).tolist())
            got = np.asarray(percentiles_from_histogram(hist, qs, n=n))
            # array-q numpy = the f64 model the reference hits
            # (process-images.py:437); device lerp is f32 -> <=1 ulp
            want = np.percentile(vals.astype(np.float32), qs)
            np.testing.assert_allclose(
                got, want, atol=255 * 1.3e-7, rtol=0,
                err_msg=f"trial {trial} {qs}",
            )


class TestKernelShapeFuzz:
    def test_kernel_pipeline_odd_shapes(self, rng):
        """Kernel pipeline (interpret mode) must match the jnp path for
        awkward shapes: tiny, prime-sized, non-lane-aligned."""
        from rgnir_tpu.kernels.pipeline import analyze_image_kernel
        from rgnir_tpu.pipeline.fused import analyze_image_jit

        for h, w in [(1, 7), (13, 13), (5, 257), (127, 31)]:
            img = jnp.asarray(
                rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            )
            a = analyze_image_kernel(img, kinds=("NDVI",))
            b = analyze_image_jit(img, kinds=("NDVI",))
            np.testing.assert_array_equal(
                np.asarray(a.wb), np.asarray(b.wb), err_msg=f"{h}x{w} wb"
            )
            np.testing.assert_array_equal(
                np.asarray(a.renders["NDVI"]), np.asarray(b.renders["NDVI"]),
                err_msg=f"{h}x{w} render",
            )
            assert float(a.stats["NDVI"].median) == float(
                b.stats["NDVI"].median
            ), (h, w)
            np.testing.assert_array_equal(
                np.asarray(a.stats["NDVI"].histogram),
                np.asarray(b.stats["NDVI"].histogram),
                err_msg=f"{h}x{w} hist",
            )


class TestHistogramChunking:
    def test_chunked_accumulation_exact(self, rng, monkeypatch):
        """Force the >2^24-safety chunked path with a tiny chunk size."""
        import rgnir_tpu.ops.histogram as H

        monkeypatch.setattr(H, "_EXACT_F32_CHUNK", 1000)
        img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)  # 4096 px
        got = np.asarray(channel_histograms(jnp.asarray(img)))
        for c in range(3):
            np.testing.assert_array_equal(
                got[c], np.bincount(img[..., c].ravel(), minlength=256)
            )

    def test_weighted_chunked(self, rng, monkeypatch):
        import rgnir_tpu.ops.histogram as H

        monkeypatch.setattr(H, "_EXACT_F32_CHUNK", 500)
        vals = jnp.asarray(rng.integers(0, 256, (4, 2000)).astype(np.int32))
        w = jnp.asarray((rng.random((4, 2000)) < 0.5).astype(np.int32))
        got = np.asarray(nibble_product_histogram(vals, w))
        vn, wn = np.asarray(vals), np.asarray(w)
        for b in range(4):
            want = np.bincount(vn[b][wn[b] == 1], minlength=256)
            np.testing.assert_array_equal(got[b], want, err_msg=str(b))

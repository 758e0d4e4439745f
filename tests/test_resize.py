"""Resize parity vs PIL LANCZOS (reference resizes: SURVEY.md 2.6)."""

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from rgnir_tpu.ops.resize import (
    analysis_dims,
    preprocess_large_image,
    resize,
    resize_matrix,
)


class TestResizeMatrix:
    def test_rows_sum_to_one(self):
        m = resize_matrix(1024, 333)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)

    def test_identity_when_same_size(self):
        m = resize_matrix(64, 64)
        np.testing.assert_allclose(m, np.eye(64), atol=1e-6)


class TestResize:
    @pytest.mark.parametrize("out_hw", [(48, 64), (100, 100), (33, 77)])
    def test_vs_pil_lanczos(self, rgnir_image, out_hw):
        got = np.asarray(
            resize(jnp.asarray(rgnir_image), out_hw, as_uint8=True)
        )
        pil = Image.fromarray(rgnir_image).resize(
            (out_hw[1], out_hw[0]), Image.Resampling.LANCZOS
        )
        want = np.array(pil)
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 2, diff.max()  # PIL fixed-point vs float
        assert (diff > 1).mean() < 0.01

    def test_upscale_runs(self, rgnir_image):
        got = np.asarray(resize(jnp.asarray(rgnir_image), (192, 256)))
        assert got.shape == (192, 256, 3)

    def test_batched(self, rgnir_batch):
        got = np.asarray(resize(jnp.asarray(rgnir_batch), (32, 48), as_uint8=True))
        assert got.shape == (4, 32, 48, 3)


class TestAnalysisDims:
    def test_reference_formula(self):
        # process-images.py:404-416 semantics
        assert analysis_dims(512, 512, 1024) == (512, 512)
        assert analysis_dims(2048, 1024, 1024) == (1024, 512)
        assert analysis_dims(1000, 3000, 1024) == (int(1000 * (1024 / 3000)), 1024)

    def test_preprocess_noop(self, rgnir_image):
        out = preprocess_large_image(jnp.asarray(rgnir_image), 1024)
        np.testing.assert_array_equal(np.asarray(out), rgnir_image)

    def test_preprocess_downscales(self, rng):
        big = rng.integers(0, 256, (200, 100, 3), dtype=np.uint8)
        out = preprocess_large_image(jnp.asarray(big), 50)
        assert out.shape == (50, 25, 3)
        assert out.dtype == jnp.uint8

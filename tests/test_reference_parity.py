"""Parity tests against the ACTUAL reference implementation.

These import the reference's own modules from /root/reference
(read-only) and compare outputs directly — stronger evidence than the
golden re-derivations in tests/golden.py. Only the headless modules are
importable (process-images.py pulls streamlit, absent here); their math
is identical to the app's (SURVEY.md section 2.5 duplication map).
"""

import importlib.util
import os
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

os.environ.setdefault("MPLBACKEND", "Agg")

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not mounted"
)


def _load(name: str, filename: str):
    spec = importlib.util.spec_from_file_location(name, REFERENCE / filename)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_backend():
    return _load("ref_backend", "backend-process.py")


@pytest.fixture(scope="module")
def ref_ndvi():
    return _load("ref_ndvi", "process-ndvi.py")


class TestAgainstReferenceCode:
    def test_white_balance_vs_reference(self, rgnir_image, ref_backend):
        from rgnir_tpu.ops.wb import white_balance

        ref_out = np.asarray(
            ref_backend.fix_white_balance(Image.fromarray(rgnir_image))
        )
        got = np.asarray(white_balance(jnp.asarray(rgnir_image)))
        diff = np.abs(got.astype(int) - ref_out.astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 2e-3

    def test_index_vs_reference(self, rgnir_image, ref_backend):
        from rgnir_tpu.ops.indices import index_from_bands
        from rgnir_tpu.config import IndexKind

        f = rgnir_image.astype(np.float32)
        red, green, nir = f[..., 0], f[..., 1], f[..., 2]
        for kind in ("NDVI", "GNDVI", "NDWI"):
            ref_idx = ref_backend.calculate_index(red, green, nir, kind)
            a, b = {
                "NDVI": (nir, red), "GNDVI": (nir, green), "NDWI": (green, nir)
            }[kind]
            got = np.asarray(index_from_bands(jnp.asarray(a), jnp.asarray(b)))
            np.testing.assert_allclose(got, ref_idx, atol=1.2e-7, rtol=0)

    def test_ndvi_and_stats_vs_reference(self, rgnir_image, ref_ndvi, tmp_path):
        from rgnir_tpu.pipeline.fused import analyze_image_jit
        from rgnir_tpu.ops.stats import to_ndvi_report_dict

        src = tmp_path / "img.png"
        Image.fromarray(rgnir_image).save(src)
        ref_arr = ref_ndvi.calculate_ndvi(str(src), visualize=False)
        ref_stats = ref_ndvi.analyze_ndvi_statistics(ref_arr)

        res = analyze_image_jit(
            jnp.asarray(rgnir_image), kinds=("NDVI",),
            with_wb=False, with_renders=False,
        )
        got_arr = np.asarray(res.indices["NDVI"])
        # reference computes in float64; ours in float32
        np.testing.assert_allclose(got_arr, ref_arr, atol=3e-7, rtol=0)
        got_stats = to_ndvi_report_dict(res.stats["NDVI"])
        for key, want in ref_stats.items():
            assert got_stats[key] == pytest.approx(want, abs=1e-5), key

    def test_batch_output_tree_vs_reference(self, rng, tmp_path, ref_backend):
        """Same inputs through both batch pipelines -> same file tree."""
        from rgnir_tpu.pipeline.batch import batch_process

        indir = tmp_path / "in"
        indir.mkdir()
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
            ).save(indir / f"s{i}.png")

        ref_backend.INPUT_DIR = str(indir)
        ref_backend.OUTPUT_DIR = str(tmp_path / "ref_out")
        ref_backend.PROCESS_WB = True
        ref_backend.PROCESS_NDVI = True
        ref_backend.PROCESS_GNDVI = False
        ref_backend.PROCESS_NDWI = False
        ref_backend.batch_process()

        batch_process(indir, tmp_path / "our_out", save_wb=True,
                      indices=("NDVI",))

        def tree(root: Path):
            return sorted(
                str(p.relative_to(root)) for p in root.rglob("*") if p.is_file()
            )

        ref_tree = tree(tmp_path / "ref_out")
        our_tree = [
            p for p in tree(tmp_path / "our_out") if not p.startswith(".")
        ]
        assert ref_tree == our_tree  # identical relative layout

        # and the WB TIFFs agree to +/-1
        for i in range(3):
            ref_wb = np.asarray(
                Image.open(tmp_path / "ref_out" / "white_balanced" / f"s{i}_wb.tif")
            )
            our_wb = np.asarray(
                Image.open(tmp_path / "our_out" / "white_balanced" / f"s{i}_wb.tif")
            )
            assert np.abs(ref_wb.astype(int) - our_wb.astype(int)).max() <= 1

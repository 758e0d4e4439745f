"""End-to-end system benchmark: the ACTUAL reference batch script vs
rgnir_tpu's batch pipeline, same input directory, wall-clock timed.

This is the honest "user switches frameworks" comparison: it imports
and executes the reference's own ``backend-process.py`` (read-only from
/root/reference; its module constants are pointed at our temp dirs) —
decode, white balance, index math, matplotlib figure rendering, file
writing — against ``rgnir_tpu.pipeline.batch.batch_process`` in both
output modes:

- ``figures=True``: byte-comparable outputs (matplotlib figure PNGs,
  like the reference) — measures how much the device math saves when
  host-side figure rendering still dominates.
- ``figures=False`` (default mode): full-resolution device colormap
  PNGs — the fast path a production deployment would use.

Usage: python benchmarks/end_to_end.py [n_images] [size]
"""

from __future__ import annotations

import importlib.util
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np
from PIL import Image

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

REFERENCE = Path("/root/reference/backend-process.py")


def make_dataset(root: Path, n: int, size: int) -> Path:
    rng = np.random.default_rng(7)
    d = root / "in"
    d.mkdir(parents=True)
    for i in range(n):
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
        img = np.stack(
            [
                60 + 40 * np.sin(xx / 9 + i) + rng.normal(0, 12, (size, size)),
                90 + 30 * np.cos(yy / 7 + i) + rng.normal(0, 10, (size, size)),
                150 + 60 * np.sin((xx + yy) / 13 + i)
                + rng.normal(0, 15, (size, size)),
            ],
            axis=-1,
        )
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            d / f"frame_{i:03d}.png"
        )
    return d


def run_reference(input_dir: Path, output_dir: Path) -> float:
    """Execute the reference's batch_process on our directories."""
    import matplotlib

    matplotlib.use("Agg")
    spec = importlib.util.spec_from_file_location(
        "reference_backend", REFERENCE
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # defs only; __main__ guard not taken
    mod.INPUT_DIR = str(input_dir)
    mod.OUTPUT_DIR = str(output_dir)
    mod.PROCESS_WB = True
    mod.PROCESS_NDVI = True
    mod.PROCESS_GNDVI = False
    mod.PROCESS_NDWI = False
    t0 = time.perf_counter()
    mod.batch_process()
    return time.perf_counter() - t0


def run_ours(input_dir: Path, output_dir: Path, figures: bool,
             fig_png_compress: int = 1) -> float:
    from rgnir_tpu.config import LoaderConfig
    from rgnir_tpu.pipeline.batch import batch_process

    # Figure mode composes matplotlib figures on the host; smaller
    # batches let the pipeline's one-batch lookahead hide device
    # compute + tunnel transfers behind composition of the previous
    # batch (with one big batch there is nothing to overlap).
    cfg = LoaderConfig(batch_size=8) if figures else LoaderConfig()
    t0 = time.perf_counter()
    summary = batch_process(
        input_dir, output_dir, save_wb=True, indices=("NDVI",),
        figures=figures, resume=False, loader_cfg=cfg,
        fig_png_compress=fig_png_compress,
    )
    dt = time.perf_counter() - t0
    assert not summary["failed"], summary["failed"]
    return dt


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    tmp = Path(tempfile.mkdtemp(prefix="rgnir_e2e_"))
    try:
        input_dir = make_dataset(tmp, n, size)
        results = {}
        # warm BOTH device programs (jit compile) outside the timed
        # region — figure mode compiles a different executable (index
        # maps instead of renders), and through the tunnel an in-region
        # compile would swamp the measurement.
        run_ours(input_dir, tmp / "warm", figures=False)
        run_ours(input_dir, tmp / "warm_fig", figures=True)
        results["ours_device_renders_s"] = run_ours(
            input_dir, tmp / "out_fast", figures=False
        )
        results["ours_figures_s"] = run_ours(
            input_dir, tmp / "out_fig", figures=True
        )
        # Same pixels, stored (uncompressed) PNGs: the single-core
        # zlib encode is ~30 ms of the per-figure floor.
        results["ours_figures_png0_s"] = run_ours(
            input_dir, tmp / "out_fig0", figures=True, fig_png_compress=0
        )
        results["reference_s"] = run_reference(input_dir, tmp / "out_ref")
        mpix = n * size * size / 1e6
        out = {
            "config": f"end_to_end_batch_{n}x{size}px_wb+ndvi",
            "mpix_total": round(mpix, 1),
            "reference_s": round(results["reference_s"], 2),
            "ours_figures_s": round(results["ours_figures_s"], 2),
            "ours_device_renders_s": round(
                results["ours_device_renders_s"], 2
            ),
            "ours_figures_png0_s": round(
                results["ours_figures_png0_s"], 2
            ),
            "speedup_like_for_like": round(
                results["reference_s"] / results["ours_figures_s"], 1
            ),
            "speedup_like_for_like_png0": round(
                results["reference_s"] / results["ours_figures_png0_s"], 1
            ),
            "speedup_fast_path": round(
                results["reference_s"] / results["ours_device_renders_s"], 1
            ),
        }
        print(json.dumps(out))
        md = _ROOT / "BENCHMARKS.md"
        if md.exists():
            text = md.read_text()
            marker = "## End-to-end vs the reference"
            if marker not in text:
                text += f"""
{marker}

`benchmarks/end_to_end.py` runs the reference's own
``backend-process.py`` (imported from /root/reference, constants
repointed) against `rgnir_tpu.pipeline.batch` on the same generated
directory ({out['config']}):

- reference (NumPy + matplotlib figures): {out['reference_s']} s
- ours, figure mode (byte-comparable outputs): {out['ours_figures_s']} s
- ours, device-render mode (full-res exact-LUT PNGs): \
{out['ours_device_renders_s']} s ({out['speedup_fast_path']}x)

Context: figure mode is matplotlib-bound on BOTH sides (~0.2-0.3 s per
10x8in@100dpi figure with tight bbox — the math is <1% of it), so
like-for-like parity mode cannot beat the reference by much; the fast
path replaces 100-dpi figures with full-resolution colormap PNGs
(exact matplotlib LUT parity per pixel). On this tunneled chip,
host<->device transfer dominates the fast path's remaining time
(~28 ms RTT + limited tunnel bandwidth); a locally attached TPU removes
that term, leaving the pipeline decode/encode-bound on the host.
"""
                md.write_text(text)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Single-image NDVI report (reference: process-ndvi.py:75-110).

Output tree parity:
- ``ndvi_visualization.png``  — NDVI figure with colorbar (12x8 in,
  RdYlGn, vmin/vmax +/-1, title 'NDVI Values'; process-ndvi.py:33-46)
- ``ndvi_histogram.png``      — 50-bin distribution over (-1, 1)
  (process-ndvi.py:96-102)
- ``ndvi_statistics.txt``     — 'NDVI Statistics:' header + 4-decimal
  ``key: value`` lines (process-ndvi.py:105-108)

Math note: process-ndvi.py computes NDVI on the *raw* image, float64,
no white balance (process-ndvi.py:17-31). The device path here is the
float32 fused pass with WB off; stats agree to ~1e-5.
"""

from __future__ import annotations

import os
import threading
from pathlib import Path
from typing import Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from rgnir_tpu.config import IndexKind
from rgnir_tpu.io.decode import decode_file
from rgnir_tpu.pipeline.fused import analyze_image_jit
from rgnir_tpu.ops.stats import to_ndvi_report_dict
from rgnir_tpu.viz.figures import _fig_to_pil, _new_figure, render_histogram_figure


def ndvi_figure(ndvi: np.ndarray) -> "object":
    """The 12x8 'NDVI Values' figure of process-ndvi.py:33-46, as a
    PIL image (tight bbox). Public helper for callers composing their
    own outputs; the report flow itself writes through the reused
    figure cache below with plain-savefig semantics (what the
    reference's plt.savefig produces)."""
    fig = _new_figure((12, 8))
    ax = fig.add_subplot(111)
    im = ax.imshow(np.asarray(ndvi), cmap="RdYlGn", vmin=-1, vmax=1)
    fig.colorbar(im, label="NDVI")
    ax.set_title("NDVI Values")
    return _fig_to_pil(fig, pad_inches=0.1)


class _VizFigureCache:
    """Reused 'NDVI Values' figure for the per-request report flow.

    Figure construction (axes, colorbar, layout) costs ~25% of the
    render; a serving process issuing many reports reuses one Agg
    figure per array shape and only ``set_data`` + draws per request
    (the blit-reuse idea of viz.figures.IndexFigureWriter, scoped to
    this one layout). Saving goes straight to disk via ``savefig`` —
    the reference writes with plain ``plt.savefig`` (process-ndvi.py:44,
    default bbox), so the old tight-bbox + encode-decode-reencode path
    both differed from the reference and double-paid the PNG encode.
    ``compress_level=1`` keeps pixels identical and shaves the zlib
    pass (same knob the batch pipeline exposes as fig_png_compress).
    """

    # Per-shape LRU: a serving process fed by mixed camera resolutions
    # must not rebuild on every alternation. Each cached layout holds a
    # live Agg canvas (~4 MB at 12x8@100dpi), so the cap stays small.
    _MAX_LAYOUTS = 4

    def __init__(self) -> None:
        from collections import OrderedDict

        self._lock = threading.Lock()
        self._layouts: "OrderedDict[tuple, tuple]" = OrderedDict()

    def save(self, ndvi: np.ndarray, path) -> None:
        from matplotlib.backends.backend_agg import FigureCanvasAgg

        with self._lock:
            entry = self._layouts.get(ndvi.shape)
            if entry is None:
                fig = _new_figure((12, 8))
                FigureCanvasAgg(fig)
                ax = fig.add_subplot(111)
                im = ax.imshow(ndvi, cmap="RdYlGn", vmin=-1, vmax=1)
                fig.colorbar(im, label="NDVI")
                ax.set_title("NDVI Values")
                entry = (fig, im)
                self._layouts[ndvi.shape] = entry
                if len(self._layouts) > self._MAX_LAYOUTS:
                    self._layouts.popitem(last=False)
            else:
                self._layouts.move_to_end(ndvi.shape)
                entry[1].set_data(ndvi)
            entry[0].savefig(
                path, format="png", pil_kwargs={"compress_level": 1}
            )


_VIZ_CACHE = _VizFigureCache()


def generate_ndvi_report(
    image_path: Union[str, Path],
    output_dir: Union[str, Path],
) -> Tuple[np.ndarray, dict]:
    """Full parity flow: NDVI map + stats + histogram + text report.

    Returns ``(ndvi_array, stats_dict)`` like the reference
    (process-ndvi.py:110).
    """
    out = Path(output_dir)
    os.makedirs(out, exist_ok=True)

    img = decode_file(image_path)
    res = analyze_image_jit(
        jnp.asarray(img), kinds=("NDVI",), with_wb=False, with_renders=False
    )
    # ONE batched transfer for everything the report needs: fetching
    # the map and each stat scalar separately costs a tunnel round
    # trip apiece (~28 ms each, ~150 ms/request measured round 5).
    ndvi, st = jax.device_get((res.indices["NDVI"], res.stats["NDVI"]))
    stats = to_ndvi_report_dict(st)

    _VIZ_CACHE.save(ndvi, out / "ndvi_visualization.png")
    render_histogram_figure(
        np.asarray(st.histogram), IndexKind.NDVI,
        out_path=out / "ndvi_histogram.png",
    )
    with open(out / "ndvi_statistics.txt", "w") as f:
        f.write("NDVI Statistics:\n")
        for key, value in stats.items():
            f.write(f"{key}: {value:.4f}\n")
    return ndvi, stats

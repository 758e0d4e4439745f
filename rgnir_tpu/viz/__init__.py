"""L2 figure rendering: matplotlib composition of device-computed data.

The reference renders figures from raw arrays, recomputing stats inside
the plot functions (process-images.py:669-989). Here the device owns all
math — index maps, stats, colormapped pixels — and this module only
*composes* figures (axes, colorbars, titles) host-side, matching the
reference's figure geometry (sizes 10x8 / 4Nx4 / 10x6 / 15x5 at 100 dpi,
SURVEY.md section 6).
"""

from rgnir_tpu.viz.figures import (
    render_index_figure,
    render_comparison_figure,
    render_time_series_figure,
    render_change_figure,
    render_histogram_figure,
    side_by_side_canvas,
)

__all__ = [
    "render_index_figure",
    "render_comparison_figure",
    "render_time_series_figure",
    "render_change_figure",
    "render_histogram_figure",
    "side_by_side_canvas",
]

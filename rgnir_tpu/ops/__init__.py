"""L0 ops: the reference's pixel math, rebuilt as jit-compiled JAX.

Public surface mirrors the reference's core functions (SURVEY.md
section 2.5 — one source of truth instead of the reference's 3-4
duplicated copies):

- ``white_balance``     <-  fix_white_balance (process-images.py:424-447)
- ``compute_index``     <-  calculate_index   (process-images.py:449-490)
- ``index_stats``       <-  analyze_index + analyze_ndvi_statistics
- ``render_colormap``   <-  create_index_visualization data plane
"""

from rgnir_tpu.ops.histogram import (
    channel_histograms,
    histogram_fixed_bins,
    order_statistic_from_histogram,
    percentiles_from_histogram,
)
from rgnir_tpu.ops.wb import (
    apply_white_balance,
    gray_world_balance,
    wb_bounds_from_histogram,
    white_balance,
)
from rgnir_tpu.ops.indices import compute_index, compute_indices, index_from_bands
from rgnir_tpu.ops.stats import (
    IndexStats,
    index_stats,
    to_analyze_index_dict,
    to_ndvi_report_dict,
)
from rgnir_tpu.ops.colormap import lut_indices, render_colormap
from rgnir_tpu.ops.select import (
    exact_quantiles,
    masked_median,
    radix_order_statistic,
)

__all__ = [
    "channel_histograms",
    "histogram_fixed_bins",
    "order_statistic_from_histogram",
    "percentiles_from_histogram",
    "apply_white_balance",
    "gray_world_balance",
    "wb_bounds_from_histogram",
    "white_balance",
    "compute_index",
    "compute_indices",
    "index_from_bands",
    "IndexStats",
    "index_stats",
    "to_analyze_index_dict",
    "to_ndvi_report_dict",
    "lut_indices",
    "render_colormap",
    "exact_quantiles",
    "masked_median",
    "radix_order_statistic",
]

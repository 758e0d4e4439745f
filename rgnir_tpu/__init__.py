"""rgnir_tpu — TPU-native UAV multispectral (RGNir) image-analysis framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``lars-uav/lars-image-processing`` (reference mounted at /root/reference):

- per-channel percentile-stretch white balance
  (reference: process-images.py:424-447)
- NDVI / GNDVI / NDWI normalized-difference index maps
  (reference: process-images.py:449-490)
- per-index statistics: mean/median/std/min/max/coverage/histogram
  (reference: process-images.py:492-513, process-ndvi.py:50-73)
- colormap renders with matplotlib-parity LUTs (RdYlGn/RdYlBu/bwr)
  (reference: process-images.py:669-716)
- phase-correlation alignment + change detection
  (reference: process-images.py:515-565, 885-989)
- time-series site monitoring (reference: process-images.py:801-883, 993-1196)
- image storage with MD5 dedupe (reference: process-images.py:24-396)
- headless batch pipeline (reference: backend-process.py)

Design is TPU-first, not a port: the whole per-image compute path (WB ->
index -> stats -> colormap) is a single fused jit/Pallas pass; percentiles
are exact via 256-bin histograms (uint8 domain) so they reduce across a
device mesh with one psum; large mosaics shard over a
``jax.sharding.Mesh`` with gathered stats.
"""

__version__ = "0.1.0"

from rgnir_tpu.config import (
    CustomIndex,
    IndexKind,
    WBConfig,
    IndexConfig,
    RenderConfig,
    TileConfig,
    register_index,
    registered_indices,
)
from rgnir_tpu.ops import (
    white_balance,
    compute_index,
    index_stats,
    render_colormap,
    channel_histograms,
    percentiles_from_histogram,
    IndexStats,
)
from rgnir_tpu.pipeline.fused import analyze_image, AnalyzeResult

__all__ = [
    "IndexKind",
    "CustomIndex",
    "register_index",
    "registered_indices",
    "WBConfig",
    "IndexConfig",
    "RenderConfig",
    "TileConfig",
    "white_balance",
    "compute_index",
    "index_stats",
    "render_colormap",
    "channel_histograms",
    "percentiles_from_histogram",
    "IndexStats",
    "analyze_image",
    "AnalyzeResult",
    "__version__",
]

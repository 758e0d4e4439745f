"""L5 pipelines: orchestration of ops/kernels into end-to-end flows.

Mirrors the reference's pipelines (SURVEY.md section 3): single-image
report (process-ndvi.py:75-110), batch directory processing
(backend-process.py:49-97), comparison analysis
(process-images.py:1400-1602), time series + change detection
(process-images.py:801-1196), and ZIP export (process-images.py:567-617).
"""

from rgnir_tpu.pipeline.fused import AnalyzeResult, analyze_image
from rgnir_tpu.pipeline.gigapixel import (
    StreamedMosaicResult, analyze_mosaic_streamed,
)

__all__ = [
    "AnalyzeResult",
    "analyze_image",
    "StreamedMosaicResult",
    "analyze_mosaic_streamed",
    # Submodules (imported lazily by callers to keep import light):
    # batch, single, compare, timeseries, change, export, streaming
]

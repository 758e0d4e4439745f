"""Pallas TPU kernels for the hot ops (SURVEY.md section 7, step 3).

The jnp paths in rgnir_tpu.ops are algorithmically TPU-shaped (MXU
histograms, no gathers) but still materialize nibble one-hots in HBM
between the compare and the contraction. These kernels keep the whole
per-tile dataflow in VMEM: read each uint8 pixel once from HBM, build
one-hots in registers/VMEM, feed the MXU, accumulate partials in
scratch across grid steps.

Every kernel has a jnp reference implementation in rgnir_tpu.ops and a
parity test; ``use_pallas()`` gates dispatch (interpret mode on CPU).
"""

from rgnir_tpu.kernels.hist import planar_histograms_pallas
from rgnir_tpu.kernels.fused import fused_analyze_pallas
from rgnir_tpu.kernels.select import (
    masked_median_pallas,
    masked_median_pallas_sharded,
    radix_order_statistic_pallas,
)

__all__ = [
    "planar_histograms_pallas",
    "fused_analyze_pallas",
    "masked_median_pallas",
    "masked_median_pallas_sharded",
    "radix_order_statistic_pallas",
]

"""Distributed exact order statistics (re-exported from ops.select).

The radix-select machinery lives in :mod:`rgnir_tpu.ops.select` (it is
equally useful single-device, where it replaces sort-based medians);
pass ``axis_name`` to psum each round's 256-int histogram over a mesh
axis — communication is 4 x 256 ints per device per statistic.
"""

from rgnir_tpu.ops.select import (
    exact_quantiles,
    f32_from_ordered_u32,
    masked_median,
    ordered_u32_from_f32,
    radix_order_statistic,
)

__all__ = [
    "ordered_u32_from_f32",
    "f32_from_ordered_u32",
    "radix_order_statistic",
    "masked_median",
    "exact_quantiles",
]

"""Distributed execution over a jax.sharding.Mesh (SURVEY.md sections 5, 7).

The reference has no parallelism of any kind (SURVEY.md section 2.4);
this package introduces the TPU-native strategies the workload actually
admits:

- **data parallelism** over image batches (shard the batch axis),
- **spatial parallelism** over mosaic tiles (shard the pixel domain,
  the 2-D analogue of sequence/context parallelism),
- **gathered reductions** for global stats: histograms/moments via
  ``psum``, extrema via ``pmax``/``pmin``, and *exact* global
  percentiles/medians via radix-select on float32 bit patterns
  (4 x 256-way histogram rounds, each one psum).

Collectives ride ICI within a slice; nothing here assumes a specific
topology beyond a named mesh axis.
"""

from rgnir_tpu.parallel.mesh import make_mesh, local_mesh
from rgnir_tpu.parallel.multihost import (
    initialize as initialize_distributed,
    mosaic_from_local_rows,
    padded_height,
    process_row_band,
    row_sharding,
)
from rgnir_tpu.parallel.reduce import (
    ordered_u32_from_f32,
    f32_from_ordered_u32,
    radix_order_statistic,
    masked_median,
)
from rgnir_tpu.parallel.mosaic import analyze_mosaic, MosaicStats
from rgnir_tpu.parallel.halo import exchange_halos, exchange_row_halos
from rgnir_tpu.parallel.change import (
    change_detection_mosaic,
    ShardedChangeResult,
    DiffStats,
)

__all__ = [
    "change_detection_mosaic",
    "ShardedChangeResult",
    "DiffStats",
    "exchange_halos",
    "exchange_row_halos",
    "make_mesh",
    "local_mesh",
    "initialize_distributed",
    "mosaic_from_local_rows",
    "padded_height",
    "process_row_band",
    "row_sharding",
    "ordered_u32_from_f32",
    "f32_from_ordered_u32",
    "radix_order_statistic",
    "masked_median",
    "analyze_mosaic",
    "MosaicStats",
]

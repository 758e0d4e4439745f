"""Per-index statistics (reference: process-images.py:492-513, process-ndvi.py:50-73).

The reference computes two overlapping stat sets; this module exposes the
union as one typed pytree (SURVEY.md section 2.5):

- ``analyze_index`` (process-images.py:506-512): mean/median/min/max +
  ``Coverage (%) = mean(index > threshold) * 100`` with threshold 0.2
  (vegetation) / 0.0 (water).
- ``analyze_ndvi_statistics`` (process-ndvi.py:60-71): mean/median/min/
  max/std + vegetation_coverage; plus the 50-bin histogram over (-1, 1)
  (process-ndvi.py:96-102).

All stats are computed in one fused device pass, are batched over
leading dims, and (via the histogram + psum design) reduce exactly
across a sharded mosaic.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Union

import flax.struct
import jax
import jax.numpy as jnp

from rgnir_tpu.config import HIST_BINS, IndexConfig, IndexKind
from rgnir_tpu.ops.histogram import histogram_fixed_bins
from rgnir_tpu.ops.select import masked_median as _radix_median


@flax.struct.dataclass
class IndexStats:
    """Statistics of one index map (leading dims = batch)."""

    mean: jax.Array          # (...,) f32
    median: jax.Array        # (...,) f32
    std: jax.Array           # (...,) f32
    min: jax.Array           # (...,) f32
    max: jax.Array           # (...,) f32
    coverage_pct: jax.Array  # (...,) f32, % pixels above threshold
    histogram: jax.Array     # (..., bins) int32 over (-1, 1)
    n: jax.Array             # (...,) int32 valid-pixel count


def _masked_median(x2d: jax.Array, mask2d: Optional[jax.Array], n: int) -> jax.Array:
    """Median over the last axis with optional mask (static valid count n).

    NumPy parity: for even n the average of the two middle order
    statistics (np.median default). Computed sort-free by radix-select
    (rgnir_tpu.ops.select) — ~10x faster than jnp.sort on TPU and the
    same code path the distributed reduction uses.
    """
    return _radix_median(x2d, n, mask=mask2d)


@functools.partial(
    jax.jit, static_argnames=("kind", "cfg", "n_valid", "with_hist")
)
def index_stats(
    index: jax.Array,
    kind: Union[IndexKind, str],
    cfg: IndexConfig = IndexConfig(),
    mask: Optional[jax.Array] = None,
    n_valid: Optional[int] = None,
    with_hist: bool = True,
) -> IndexStats:
    """Full statistics of an ``(..., H, W)`` index map.

    Args:
      index: float32 index values in [-1, 1].
      kind: selects the coverage threshold (0.2 vegetation / 0.0 water,
        process-images.py:498-503).
      mask: optional ``(..., H, W)`` validity mask; ``n_valid`` (static)
        required with it.
    """
    kind = IndexKind.parse(kind)
    h, w = index.shape[-2], index.shape[-1]
    n = h * w if mask is None else n_valid
    if mask is not None and n_valid is None:
        raise ValueError("n_valid (static) required with mask")

    x = index.astype(jnp.float32)
    batch_shape = x.shape[:-2]
    flat = x.reshape(batch_shape + (h * w,))
    mflat = None if mask is None else mask.reshape(batch_shape + (h * w,)).astype(bool)

    if mflat is None:
        total = jnp.sum(flat, axis=-1)
        mean = total / n
        var = jnp.sum(jnp.square(flat - mean[..., None]), axis=-1) / n
        mn = jnp.min(flat, axis=-1)
        mx = jnp.max(flat, axis=-1)
        above = jnp.sum((flat > kind.coverage_threshold).astype(jnp.int32), axis=-1)
    else:
        mf = mflat.astype(jnp.float32)
        total = jnp.sum(flat * mf, axis=-1)
        mean = total / n
        var = jnp.sum(jnp.square(flat - mean[..., None]) * mf, axis=-1) / n
        mn = jnp.min(jnp.where(mflat, flat, jnp.inf), axis=-1)
        mx = jnp.max(jnp.where(mflat, flat, -jnp.inf), axis=-1)
        above = jnp.sum(
            ((flat > kind.coverage_threshold) & mflat).astype(jnp.int32), axis=-1
        )

    median = _masked_median(flat, mflat, n)
    # with_hist=False: the reference's analyze_index
    # (process-images.py:492-513) computes no histogram; callers that
    # only need its stat set skip the 50-bin pass and get histogram=None
    # (explicit, never silent zeros).
    hist = (
        histogram_fixed_bins(
            x, bins=cfg.hist_bins, lo=cfg.clip_lo, hi=cfg.clip_hi,
            mask=mask, reduce_axes=(-2, -1),
        )
        if with_hist else None
    )
    return IndexStats(
        mean=mean,
        median=median,
        std=jnp.sqrt(var),
        min=mn,
        max=mx,
        coverage_pct=above.astype(jnp.float32) / n * 100.0,
        histogram=hist,
        n=jnp.full(batch_shape, n, dtype=jnp.int32),
    )


def to_analyze_index_dict(stats: IndexStats, kind: Union[IndexKind, str]) -> Dict[str, float]:
    """The exact dict of reference ``analyze_index`` (process-images.py:506-512)."""
    kind = IndexKind.parse(kind)
    return {
        f"Mean {kind.value}": float(stats.mean),
        f"Median {kind.value}": float(stats.median),
        f"Min {kind.value}": float(stats.min),
        f"Max {kind.value}": float(stats.max),
        f"{kind.feature_name} Coverage (%)": float(stats.coverage_pct),
    }


def to_ndvi_report_dict(stats: IndexStats) -> Dict[str, float]:
    """The exact dict of ``analyze_ndvi_statistics`` (process-ndvi.py:60-71)."""
    return {
        "mean_ndvi": float(stats.mean),
        "median_ndvi": float(stats.median),
        "min_ndvi": float(stats.min),
        "max_ndvi": float(stats.max),
        "std_ndvi": float(stats.std),
        "vegetation_coverage": float(stats.coverage_pct),
    }

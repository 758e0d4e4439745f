"""Sharded whole-mosaic analysis: spatial parallelism over a device mesh.

BASELINE configs 3 and 5 (4096^2 tiled mosaic; gigapixel multi-chip
survey with gathered histograms). The pixel domain is sharded row-block
per device; every reduction the pipeline needs is gathered exactly:

- white-balance percentiles: per-channel 256-bin histograms, one
  ``psum`` -> *globally consistent* stretch (the reference, one image
  at a time, cannot do this at all),
- mean/std/coverage/50-bin histogram: ``psum`` of partial sums/counts,
- min/max: ``pmin``/``pmax``,
- median: exact radix-select (rgnir_tpu.parallel.reduce), 4 psums.

The per-pixel work (WB rescale, index, colormap) stays embarrassingly
parallel on the local shard — zero halo, zero resharding.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple, Union

import flax.struct
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rgnir_tpu.config import ALL_INDICES, IndexConfig, IndexKind, WBConfig
from rgnir_tpu.ops.colormap import render_colormap
from rgnir_tpu.ops.histogram import histogram_fixed_bins, planar_histograms
from rgnir_tpu.ops.indices import BAND_INDICES, index_from_bands
from rgnir_tpu.ops.stats import IndexStats
from rgnir_tpu.ops.wb import apply_white_balance_planar, wb_bounds_from_histogram
from rgnir_tpu.parallel.mesh import local_mesh
from rgnir_tpu.parallel.reduce import masked_median


@flax.struct.dataclass
class MosaicResult:
    wb: jax.Array                  # (H_pad, W, 3) uint8, row-sharded
    indices: Dict[str, jax.Array]  # kind -> (H_pad, W) f32, row-sharded
    renders: Dict[str, jax.Array]  # kind -> (H_pad, W, 3) uint8 (may be empty)
    stats: Dict[str, IndexStats]   # kind -> global scalar stats (replicated)


MosaicStats = Dict[str, IndexStats]


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def analyze_mosaic(
    mosaic: jax.Array,
    kinds: Sequence[Union[IndexKind, str]] = ALL_INDICES,
    mesh: Optional[Mesh] = None,
    wb_cfg: WBConfig = WBConfig(),
    idx_cfg: IndexConfig = IndexConfig(),
    with_renders: bool = False,
) -> MosaicResult:
    """Analyze one large ``(H, W, 3)`` uint8 mosaic sharded over a mesh.

    Rows are padded to a device multiple and block-sharded; all global
    statistics are exact (padding masked out of every reduction).
    Returned pixel outputs keep the row padding (slice with
    ``[:H]`` on the host if needed); stats are replicated.
    """
    if mesh is None:
        mesh = local_mesh()
    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    kinds = tuple(IndexKind.parse(k) for k in kinds)

    h, w = int(mosaic.shape[0]), int(mosaic.shape[1])
    n_valid = h * w
    hp = _ceil_to(h, n_dev)
    if hp != h:
        mosaic = jnp.pad(mosaic, ((0, hp - h), (0, 0), (0, 0)))
    block_h = hp // n_dev

    def shard_fn(tile: jax.Array):
        # tile: (block_h, W, 3) uint8 local shard -> planar (3, bh, W)
        row0 = jax.lax.axis_index(axis) * block_h
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (block_h, 1), 0)
        mask = jnp.broadcast_to(rows < h, (block_h, w))

        pl = jnp.moveaxis(tile, -1, -3)
        hist = planar_histograms(pl, mask=mask)
        hist = jax.lax.psum(hist, axis)
        lo, hi = wb_bounds_from_histogram(hist, n=n_valid, cfg=wb_cfg)
        wb_pl = apply_white_balance_planar(pl, lo, hi, cfg=wb_cfg)
        wb = jnp.moveaxis(wb_pl, -3, -1)

        indices: Dict[str, jax.Array] = {}
        renders: Dict[str, jax.Array] = {}
        stats: Dict[str, IndexStats] = {}
        for kind in kinds:
            ia, ib = BAND_INDICES[kind]
            idx = index_from_bands(wb_pl[ia], wb_pl[ib], cfg=idx_cfg)
            indices[kind.value] = idx
            mf = mask.astype(jnp.float32)
            s1 = jax.lax.psum(jnp.sum(idx * mf), axis)
            mean = s1 / n_valid
            s2 = jax.lax.psum(jnp.sum(jnp.square(idx - mean) * mf), axis)
            mn = jax.lax.pmin(jnp.min(jnp.where(mask, idx, jnp.inf)), axis)
            mx = jax.lax.pmax(jnp.max(jnp.where(mask, idx, -jnp.inf)), axis)
            above = jax.lax.psum(
                jnp.sum(((idx > kind.coverage_threshold) & mask).astype(jnp.int32)),
                axis,
            )
            med = masked_median(
                idx, n_valid, mask=mask, axis_name=axis, reduce_ndim=2
            )
            h50 = jax.lax.psum(
                histogram_fixed_bins(
                    idx, idx_cfg.hist_bins, idx_cfg.clip_lo, idx_cfg.clip_hi,
                    mask=mask,
                ),
                axis,
            )
            stats[kind.value] = IndexStats(
                mean=mean,
                median=med,
                std=jnp.sqrt(s2 / n_valid),
                min=mn,
                max=mx,
                coverage_pct=above.astype(jnp.float32) / n_valid * 100.0,
                histogram=h50,
                n=jnp.int32(n_valid),
            )
            if with_renders:
                renders[kind.value] = render_colormap(idx, kind)
        return wb, indices, renders, stats

    out_specs = (P(axis), P(axis), P(axis), P())
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=out_specs,
        check_vma=False,
    )
    wb, indices, renders, stats = jax.jit(fn)(mosaic)
    return MosaicResult(wb=wb, indices=indices, renders=renders, stats=stats)

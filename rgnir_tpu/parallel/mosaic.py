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
from rgnir_tpu.ops.indices import band_indices, index_from_bands
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
    impl: str = "jnp",
    valid_rows: Optional[int] = None,
) -> MosaicResult:
    """Analyze one large ``(H, W, 3)`` uint8 mosaic sharded over a mesh.

    Rows are padded to a device multiple and block-sharded; all global
    statistics are exact (padding masked out of every reduction).
    Returned pixel outputs keep the row padding (slice with
    ``[:H]`` on the host if needed); stats are replicated.

    ``valid_rows``: when the caller pre-padded the row dimension (the
    multi-host data plane pads to a device multiple BEFORE the per-host
    band cut, parallel/multihost.py), pass the true image height here
    so the pad rows are masked out of every statistic exactly like the
    internal padding.

    ``impl``: "jnp" (default, compiles on every backend) or "kernel"
    (Pallas fused kernels inside the shard — the multi-chip TPU
    production path; interpret-mode on CPU). Both are parity-tested.

    A 2-D mesh (e.g. axes ``("dr", "dc")``) shards rows AND columns —
    the right layout for wide gigapixel strips; reductions psum over
    both axes (both impls; the kernel body uses analytic padding
    correction plus the rectangular-validity Pallas select).
    """
    if mesh is None:
        mesh = local_mesh()
    kinds = tuple(IndexKind.parse(k) for k in kinds)
    if len(mesh.axis_names) == 2:
        if impl == "kernel":
            return _analyze_mosaic_kernel_2d(
                mosaic, kinds, mesh, wb_cfg, idx_cfg, with_renders,
                valid_rows=valid_rows,
            )
        return _analyze_mosaic_2d(
            mosaic, kinds, mesh, wb_cfg, idx_cfg, with_renders,
            valid_rows=valid_rows,
        )
    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)

    h_in, w = int(mosaic.shape[0]), int(mosaic.shape[1])
    h = h_in if valid_rows is None else int(valid_rows)
    n_valid = h * w
    hp = _ceil_to(h_in, n_dev)
    if hp != h_in:
        mosaic = jnp.pad(mosaic, ((0, hp - h_in), (0, 0), (0, 0)))
    block_h = hp // n_dev

    if impl == "kernel":
        return _analyze_mosaic_kernel(
            mosaic, kinds, mesh, axis, block_h, h, w, wb_cfg, idx_cfg,
            with_renders,
        )

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
            ia, ib = band_indices(kind)
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


def _analyze_mosaic_kernel(
    mosaic, kinds, mesh, axis, block_h, h, w, wb_cfg, idx_cfg, with_renders
):
    """Kernel-backed shard body: Pallas fused histogram + analyze kernels
    per shard, exact global reductions between them. Medians use the
    distributed PALLAS radix-select (per-round VMEM-key byte histogram,
    one psum of 256 ints per round) — measured ~3x cheaper than the jnp
    distributed radix, which dominated this shard body (7.9 of 10.4 ms
    on a 4096^2 single-chip mesh, benchmark config 6)."""
    from rgnir_tpu.kernels.fused import (
        S_ABOVE, S_HIST, S_MAX, S_MIN, S_SUM, fused_analyze_pallas,
    )
    from rgnir_tpu.kernels.hist import planar_histograms_pallas
    from rgnir_tpu.kernels.select import masked_median_pallas_sharded

    n_valid = h * w

    def shard_fn(tile: jax.Array):
        row0 = jax.lax.axis_index(axis) * block_h
        rows_live = jnp.clip(h - row0, 0, block_h)
        n_live = rows_live * w  # traced per-shard valid count

        pl = jnp.moveaxis(tile, -1, -3)
        hist = planar_histograms_pallas(pl, n_valid=n_live)
        hist = jax.lax.psum(hist, axis)
        lo, hi = wb_bounds_from_histogram(hist, n=n_valid, cfg=wb_cfg)
        # round0_digit="q24": the fused kernel emits the quantized
        # select's round-0 histogram (the render byte) per shard; one
        # psum makes it global, dropping a whole distributed radix
        # round AND its 256-int collective (4 rounds + successor ->
        # 2 rounds + merged recovery; see select.py ``quantized``).
        wb_pl, idx, rgb, partials, r0 = fused_analyze_pallas(
            pl, lo, hi, kinds, n_valid=n_live, with_renders=with_renders,
            with_round0=True, round0_digit="q24", bounds_nonneg=True,
        )
        r0 = jax.lax.psum(r0, axis)  # (K, 256) global top-byte counts
        wb = jnp.moveaxis(wb_pl, -3, -1)

        rowmask = (
            jax.lax.broadcasted_iota(jnp.int32, (block_h, 1), 0) < rows_live
        )
        mask = jnp.broadcast_to(rowmask, (block_h, w))

        indices: Dict[str, jax.Array] = {}
        renders: Dict[str, jax.Array] = {}
        stats: Dict[str, IndexStats] = {}
        for k, kind in enumerate(kinds):
            s = partials[k]
            s_sum = jax.lax.psum(s[S_SUM], axis)
            s_above = jax.lax.psum(s[S_ABOVE], axis)
            mn = jax.lax.pmin(s[S_MIN], axis)
            mx = jax.lax.pmax(s[S_MAX], axis)
            h50 = jax.lax.psum(s[S_HIST:S_HIST + 50], axis)
            mean = s_sum / n_valid
            # two-pass variance: centering on the global mean avoids the
            # one-pass form's f32 cancellation (see kernels/pipeline.py)
            mf = mask.astype(jnp.float32)
            var = jax.lax.psum(
                jnp.sum(jnp.square(idx[k] - mean) * mf), axis
            ) / n_valid
            # Row-block padding is a flat prefix of the full-width
            # shard, exactly what the sharded Pallas select masks.
            med = masked_median_pallas_sharded(
                idx[k], n_valid, n_live, axis,
                quantized=True, round0_hist=r0[k],
            )
            indices[kind.value] = idx[k]
            if with_renders:
                renders[kind.value] = jnp.moveaxis(rgb[k], -3, -1)
            stats[kind.value] = IndexStats(
                mean=mean, median=med, std=jnp.sqrt(var), min=mn, max=mx,
                coverage_pct=s_above / n_valid * 100.0,
                histogram=h50.astype(jnp.int32),
                n=jnp.int32(n_valid),
            )
        return wb, indices, renders, stats

    fn = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=P(axis),
        out_specs=(P(axis), P(axis), P(axis), P()),
        check_vma=False,
    )
    wb, indices, renders, stats = jax.jit(fn)(mosaic)
    return MosaicResult(wb=wb, indices=indices, renders=renders, stats=stats)


def _analyze_mosaic_2d(mosaic, kinds, mesh, wb_cfg, idx_cfg, with_renders,
                       valid_rows=None):
    """Row x column sharding over a 2-D mesh; every reduction psums over
    BOTH axes, so global stats remain exact. The pixel-domain analogue
    of 2-D tensor sharding for wide survey strips."""
    ar, ac = mesh.axis_names
    dr, dc = (int(s) for s in mesh.devices.shape)
    h_in, w = int(mosaic.shape[0]), int(mosaic.shape[1])
    h = h_in if valid_rows is None else int(valid_rows)
    n_valid = h * w
    hp, wp = _ceil_to(h_in, dr), _ceil_to(w, dc)
    if (hp, wp) != (h_in, w):
        mosaic = jnp.pad(mosaic, ((0, hp - h_in), (0, wp - w), (0, 0)))
    bh, bw = hp // dr, wp // dc
    axes = (ar, ac)

    def shard_fn(tile: jax.Array):
        row0 = jax.lax.axis_index(ar) * bh
        col0 = jax.lax.axis_index(ac) * bw
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
        mask = (rows < h) & (cols < w)

        pl = jnp.moveaxis(tile, -1, -3)
        hist = jax.lax.psum(planar_histograms(pl, mask=mask), axes)
        lo, hi = wb_bounds_from_histogram(hist, n=n_valid, cfg=wb_cfg)
        wb_pl = apply_white_balance_planar(pl, lo, hi, cfg=wb_cfg)
        wb = jnp.moveaxis(wb_pl, -3, -1)

        indices: Dict[str, jax.Array] = {}
        renders: Dict[str, jax.Array] = {}
        stats: Dict[str, IndexStats] = {}
        for kind in kinds:
            ia, ib = band_indices(kind)
            idx = index_from_bands(wb_pl[ia], wb_pl[ib], cfg=idx_cfg)
            indices[kind.value] = idx
            mf = mask.astype(jnp.float32)
            mean = jax.lax.psum(jnp.sum(idx * mf), axes) / n_valid
            s2 = jax.lax.psum(jnp.sum(jnp.square(idx - mean) * mf), axes)
            mn = jax.lax.pmin(jnp.min(jnp.where(mask, idx, jnp.inf)), axes)
            mx = jax.lax.pmax(jnp.max(jnp.where(mask, idx, -jnp.inf)), axes)
            above = jax.lax.psum(
                jnp.sum(((idx > kind.coverage_threshold) & mask)
                        .astype(jnp.int32)),
                axes,
            )
            med = masked_median(
                idx, n_valid, mask=mask, axis_name=axes, reduce_ndim=2
            )
            h50 = jax.lax.psum(
                histogram_fixed_bins(
                    idx, idx_cfg.hist_bins, idx_cfg.clip_lo,
                    idx_cfg.clip_hi, mask=mask,
                ),
                axes,
            )
            stats[kind.value] = IndexStats(
                mean=mean, median=med, std=jnp.sqrt(s2 / n_valid),
                min=mn, max=mx,
                coverage_pct=above.astype(jnp.float32) / n_valid * 100.0,
                histogram=h50, n=jnp.int32(n_valid),
            )
            if with_renders:
                renders[kind.value] = render_colormap(idx, kind)
        return wb, indices, renders, stats

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=P(ar, ac),
        out_specs=(P(ar, ac), P(ar, ac), P(ar, ac), P()),
        check_vma=False,
    )
    wb, indices, renders, stats = jax.jit(fn)(mosaic)
    return MosaicResult(wb=wb, indices=indices, renders=renders, stats=stats)


def _analyze_mosaic_kernel_2d(mosaic, kinds, mesh, wb_cfg, idx_cfg,
                              with_renders, valid_rows=None):
    """Pallas shard body for 2-D meshes via analytic padding correction.

    The kernels' positional prefix masks cannot express column padding,
    so shards run UNMASKED and the padding's exactly-known contribution
    is subtracted afterwards: pad pixels are zeros, the white-balance
    low bound of uint8 data is >= 0, hence wb(pad) == 0 exactly and
    index(pad) == 0 exactly. Therefore:
      - channel histograms: pad inflates bin 0 only -> subtract,
      - index sum/sumsq/coverage: zero contribution (0 > thresholds is
        false for both 0.2 and 0.0) -> already exact,
      - 50-bin histogram: pad lands in bin 25 ([0, 0.04)) -> subtract,
      - min/max: not linear, masked jnp reductions; median: the
        distributed Pallas radix-select with rectangular
        (rows_live x cols_live) positional validity.
    Bit-identical to the jnp 2-D body by test.
    """
    from rgnir_tpu.kernels.fused import (
        S_ABOVE, S_HIST, S_SUM, fused_analyze_pallas,
    )
    from rgnir_tpu.kernels.hist import planar_histograms_pallas
    from rgnir_tpu.kernels.select import masked_median_pallas_sharded

    ar, ac = mesh.axis_names
    dr, dc = (int(s) for s in mesh.devices.shape)
    h_in, w = int(mosaic.shape[0]), int(mosaic.shape[1])
    # User pre-padding (multihost band cuts) is zeros, exactly like our
    # own padding, so the analytic correction below covers both.
    h = h_in if valid_rows is None else int(valid_rows)
    n_valid = h * w
    hp, wp = _ceil_to(h_in, dr), _ceil_to(w, dc)
    if (hp, wp) != (h_in, w):
        mosaic = jnp.pad(mosaic, ((0, hp - h_in), (0, wp - w), (0, 0)))
    bh, bw = hp // dr, wp // dc
    axes = (ar, ac)
    pad_total = hp * wp - n_valid

    def shard_fn(tile: jax.Array):
        row0 = jax.lax.axis_index(ar) * bh
        col0 = jax.lax.axis_index(ac) * bw
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
        mask = (rows < h) & (cols < w)

        pl = jnp.moveaxis(tile, -1, -3)
        hist = jax.lax.psum(planar_histograms_pallas(pl), axes)
        hist = hist.at[:, 0].add(-pad_total)  # pad zeros -> bin 0
        lo, hi = wb_bounds_from_histogram(hist, n=n_valid, cfg=wb_cfg)
        wb_pl, idx, rgb, partials, r0 = fused_analyze_pallas(
            pl, lo, hi, kinds, with_renders=with_renders,
            with_round0=True, round0_digit="q24", bounds_nonneg=True,
        )
        # The fused call sees no validity here (analytic corrections
        # handle padding): pad pixels have index exactly 0.0 (wb(0)=0
        # both bands), whose q24 top byte is floor((0+1)*128) = 128 —
        # subtract them from that bin after the psum, the same trick
        # as the 50-bin histogram's bin-25 correction below. Rounds
        # 1-2 and the recovery mask pads positionally (live_rc).
        r0 = jax.lax.psum(r0, axes)
        r0 = r0.at[:, 128].add(-pad_total)
        wb = jnp.moveaxis(wb_pl, -3, -1)

        indices: Dict[str, jax.Array] = {}
        renders: Dict[str, jax.Array] = {}
        stats: Dict[str, IndexStats] = {}
        for k, kind in enumerate(kinds):
            s = partials[k]
            mean = jax.lax.psum(s[S_SUM], axes) / n_valid  # pad adds 0
            above = jax.lax.psum(s[S_ABOVE], axes)         # 0 > thr false
            h50 = jax.lax.psum(s[S_HIST:S_HIST + 50], axes)
            h50 = h50.at[25].add(-pad_total)  # index(pad)=0 -> bin 25
            mf = mask.astype(jnp.float32)
            var = jax.lax.psum(
                jnp.sum(jnp.square(idx[k] - mean) * mf), axes
            ) / n_valid
            mn = jax.lax.pmin(
                jnp.min(jnp.where(mask, idx[k], jnp.inf)), axes
            )
            mx = jax.lax.pmax(
                jnp.max(jnp.where(mask, idx[k], -jnp.inf)), axes
            )
            # Rectangular validity (rows_live x cols_live top-left
            # block) — the 2-D layout of the distributed Pallas select.
            med = masked_median_pallas_sharded(
                idx[k], n_valid, None, axes,
                live_rc=(
                    jnp.clip(h - row0, 0, bh), jnp.clip(w - col0, 0, bw)
                ),
                quantized=True, round0_hist=r0[k],
            )
            indices[kind.value] = idx[k]
            if with_renders:
                renders[kind.value] = jnp.moveaxis(rgb[k], -3, -1)
            stats[kind.value] = IndexStats(
                mean=mean, median=med, std=jnp.sqrt(var), min=mn, max=mx,
                coverage_pct=above / n_valid * 100.0,
                histogram=h50.astype(jnp.int32), n=jnp.int32(n_valid),
            )
        return wb, indices, renders, stats

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=P(ar, ac),
        out_specs=(P(ar, ac), P(ar, ac), P(ar, ac), P()),
        check_vma=False,
    )
    wb, indices, renders, stats = jax.jit(fn)(mosaic)
    return MosaicResult(wb=wb, indices=indices, renders=renders, stats=stats)

"""True-gigapixel single-chip analysis: host-streamed band reduction.

``parallel.mosaic.analyze_mosaic`` needs the whole mosaic resident in
HBM, which caps a 16 GB chip around ~1.3 GPix of uint8 input plus f32
index/render maps — BASELINE config 5's "gigapixel survey" could never
actually run at gigapixels on one chip. This module removes the memory
wall entirely: the mosaic streams through the device in row bands and
NOTHING per-pixel is ever materialized for the whole image.

The TPU-native key insight (an extension of ops/histogram's order-
statistic trick): white balance is a per-channel *byte LUT* (the
percentile stretch maps uint8 -> uint8), and every normalized-
difference index is an elementwise function of TWO white-balanced
bytes. Therefore the **256 x 256 joint histogram of the two raw source
channels** determines the index map's exact value *multiset*:

    stats(index(WB(img))) == stats over { v[a, b] with weight J[a, b] }
    v[a, b] = index(LUT_A[a], LUT_B[b])     (the same f32 ops, 65536x)

and the joint histogram J is a pure contraction —
``J = onehot(A)^T @ onehot(B)`` — i.e. one (256, N) x (N, 256) matmul
per band chunk that runs on the MXU at bf16. One streaming pass over
the data yields *bit-exact* global WB bounds (marginals of J are the
channel histograms), mean/median/min/max/coverage/50-bin histogram of
every requested index — identical values to the all-in-HBM path,
because both paths evaluate the same f32 index function on the same
multiset of byte pairs.

Host -> device transfer is double-buffered: band i+1's ``device_put``
is issued before band i's reduction is awaited, so transfer and MXU
work overlap. Accumulation is int32 on device (exact: a band holds
< 2^31 pixels) and int64 on the host across bands (exact at any
mosaic size).

Reference semantics covered: fix_white_balance
(process-images.py:424-447), calculate_index (449-490), analyze_index
(492-513) — at a scale the reference (1024-px alignment cap, one PIL
image in RAM) cannot reach.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterable, Iterator, Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from rgnir_tpu.config import IndexConfig, IndexKind, WBConfig
from rgnir_tpu.ops.histogram import percentiles_from_histogram
from rgnir_tpu.ops.indices import band_indices, index_from_bands
from rgnir_tpu.ops.stats import IndexStats
from rgnir_tpu.ops.wb import apply_white_balance_planar

# Pixels per one-hot chunk: the (chunk, 256) bf16 one-hots stay ~16 MB
# (VMEM-friendly after XLA tiling) and integer counts stay far below
# f32's 2^24 exact range.
_CHUNK = 1 << 17

# Exact-accumulation window: int32 on device within one flush, and no
# uint32 host bin can wrap below this many pixels per band. Bands
# larger than this are re-split into row sub-bands (validated()).
_FLUSH_AT = (1 << 31) - (1 << 26)


def _pair_layout(
    kinds: Sequence[IndexKind],
) -> Tuple[Tuple[Tuple[int, int], ...], Dict[IndexKind, Tuple[int, bool]]]:
    """Unordered channel pairs to histogram + per-kind (pair, swapped).

    NDWI's (G, NIR) is the transpose of GNDVI's (NIR, G) — one joint
    histogram serves both.
    """
    pairs = []
    lookup: Dict[IndexKind, Tuple[int, bool]] = {}
    for kind in kinds:
        ia, ib = band_indices(kind)
        key, swapped = ((ia, ib), False) if ia <= ib else ((ib, ia), True)
        if key not in pairs:
            pairs.append(key)
        lookup[kind] = (pairs.index(key), swapped)
    return tuple(pairs), lookup


def _joint_hists_body(
    band: jax.Array,
    acc: jax.Array,
    pairs: Tuple[Tuple[int, int], ...],
    chunk: int,
) -> jax.Array:
    """Trace-level core of the band reduction (shared by the
    single-device jit and the shard_map shard body below).

    Pads ``band`` to a ``chunk`` multiple with zero rows (the caller
    accounts for them in bin [0, 0]); each chunk builds bf16 one-hots
    per referenced channel and runs one (256, chunk) x (chunk, 256)
    MXU contraction per pair; counts are exact (chunk < 2^24) and
    accumulate in int32.
    """
    n, n_ch = band.shape
    n_pad = -n % chunk
    if n_pad:
        band = jnp.concatenate(
            [band, jnp.zeros((n_pad, n_ch), dtype=band.dtype)]
        )
    chunks = band.reshape(-1, chunk, n_ch)
    iota = jnp.arange(256, dtype=jnp.int32)
    channels = sorted({c for p in pairs for c in p})

    def body(carry, chunk):
        oh = {
            c: (chunk[:, c].astype(jnp.int32)[:, None] == iota).astype(
                jnp.bfloat16
            )
            for c in channels
        }
        hs = [
            jax.lax.dot_general(
                oh[ia], oh[ib],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            for ia, ib in pairs
        ]
        return carry + jnp.stack(hs), None

    acc, _ = jax.lax.scan(body, acc, chunks)
    return acc


@functools.partial(
    jax.jit, static_argnames=("pairs", "chunk"), donate_argnums=(1,)
)
def _band_joint_hists(
    band: jax.Array,
    acc: jax.Array,
    pairs: Tuple[Tuple[int, int], ...],
    chunk: int,
) -> jax.Array:
    """Accumulate (P, 256, 256) joint histograms of a uint8 band.

    ``band``: (N, C) uint8 — flattened pixels, C = the referenced
    channels only (compacted by the caller), padded with zero rows —
    the caller subtracts the pad count from bin [0, 0].
    ``acc``: (P, 256, 256) int32, donated.
    ``chunk``: pixels per one-hot chunk — a STATIC argument, not the
    module global, so the caller's ``-n % chunk`` pad accounting always
    matches the executable it actually runs (a trace-time read of
    ``_CHUNK`` let a cached trace from one chunk size serve a call
    under another, silently corrupting bin [0, 0]).
    """
    return _joint_hists_body(band, acc, pairs, chunk)


@functools.partial(
    jax.jit, static_argnames=("pairs", "chunk", "mesh", "axis")
)
def _band_joint_hists_sharded(
    band: jax.Array,
    acc: jax.Array,
    pairs: Tuple[Tuple[int, int], ...],
    chunk: int,
    mesh: jax.sharding.Mesh,
    axis: str,
) -> jax.Array:
    """Multi-chip band reduction: the flat pixel axis is sharded over
    the mesh, every device contracts its own range with the same MXU
    one-hot kernel, and ONE ``psum`` of the tiny (P, 256, 256) partial
    gathers the band — the per-pixel traffic all stays device-local
    (the joint histogram is the only thing that crosses ICI).

    ``band`` rows must be divisible by the mesh size (the caller pads
    and accounts for the pad in bin [0, 0]); ``acc`` is replicated.
    """

    def shard_body(b: jax.Array, a: jax.Array) -> jax.Array:
        # pcast to=varying: the scan carry must share the shard data's
        # varying-manual-axes type, or shard_map rejects the scan.
        zero = jax.lax.pcast(jnp.zeros_like(a), (axis,), to="varying")
        h = _joint_hists_body(b, zero, pairs, chunk)
        return a + jax.lax.psum(h, axis)

    from jax.sharding import PartitionSpec as P

    fn = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(axis, None), P()), out_specs=P(),
    )
    return fn(band, acc)


def _np_fixed_bins(
    values: np.ndarray, counts: np.ndarray, bins: int, lo: float, hi: float
) -> np.ndarray:
    """Weighted replica of ops.histogram.histogram_fixed_bins for the
    65536-value grid: the exact f32-edge searchsorted rule
    ``bin = #(interior/final edges <= v)``, which that op's affine fast
    path is certified equal to."""
    v = values.astype(np.float32)
    edges = np.linspace(lo, hi, bins + 1).astype(np.float32)
    idx = np.minimum(
        (v[:, None] >= edges[None, 1:]).sum(axis=1, dtype=np.int64),
        bins - 1,
    )
    in_range = (v >= edges[0]) & (v <= edges[-1])
    out = np.zeros(bins, dtype=np.int64)
    np.add.at(out, idx[in_range], counts[in_range])
    return out


def _grid_stats(
    v: np.ndarray,
    counts: np.ndarray,
    kind: IndexKind,
    cfg: IndexConfig,
) -> IndexStats:
    """Exact IndexStats of the value multiset {v[i] x counts[i]}.

    Value-level results (min/max/median) are bit-identical to the
    in-HBM path; mean/std are float64-summed over the 65536-bin grid
    (MORE accurate than the device's f32 tree reduction — tests bound
    the difference at ~1e-6).
    """
    c = counts.astype(np.int64)
    n = int(c.sum())
    live = c > 0
    vf64 = v.astype(np.float64)
    mean = float((vf64 * c).sum() / n)
    var = float((np.square(vf64 - mean) * c).sum() / n)
    mn = float(v[live].min())
    mx = float(v[live].max())
    above = int(c[v > np.float32(kind.coverage_threshold)].sum())

    # np.median parity: average of the two middle order statistics in
    # f32 (the same convention as ops.select.masked_median).
    order = np.argsort(v, kind="stable")
    csum = np.cumsum(c[order])
    k1, k2 = (n - 1) // 2, n // 2
    i1 = int(np.searchsorted(csum, k1 + 1))
    i2 = int(np.searchsorted(csum, k2 + 1))
    median = float(
        (v[order[i1]].astype(np.float32) + v[order[i2]].astype(np.float32))
        / np.float32(2.0)
    )

    hist = _np_fixed_bins(v, c, cfg.hist_bins, cfg.clip_lo, cfg.clip_hi)
    return IndexStats(
        mean=np.float32(mean),
        median=np.float32(median),
        std=np.float32(np.sqrt(var)),
        min=np.float32(mn),
        max=np.float32(mx),
        coverage_pct=np.float32(above) / np.float32(n) * np.float32(100.0),
        histogram=hist.astype(np.int64),
        n=np.int64(n),
    )


class StreamedMosaicResult:
    """Exact global statistics of a streamed mosaic.

    Attributes:
      stats: kind name -> IndexStats (numpy scalars; feed
        ``ops.stats.to_analyze_index_dict`` as usual).
      wb_lo / wb_hi: per-referenced-channel stretch bounds (indexable
        by channel number; channels never referenced are NaN).
      n_pixels: total pixels streamed (int).
      bands: number of bands processed.
    """

    def __init__(self, stats, wb_lo, wb_hi, n_pixels, bands):
        self.stats = stats
        self.wb_lo = wb_lo
        self.wb_hi = wb_hi
        self.n_pixels = n_pixels
        self.bands = bands


def iter_row_bands(
    mosaic: np.ndarray, band_rows: int
) -> Iterator[np.ndarray]:
    """Slice an (H, W, 3) array-like (ndarray / np.memmap) into row
    bands without copying."""
    for r0 in range(0, mosaic.shape[0], band_rows):
        yield mosaic[r0:r0 + band_rows]


def analyze_mosaic_streamed(
    bands: Union[np.ndarray, Iterable[np.ndarray]],
    kinds: Sequence[Union[IndexKind, str]] = (IndexKind.NDVI,),
    band_rows: int = 2048,
    wb_cfg: WBConfig = WBConfig(),
    idx_cfg: IndexConfig = IndexConfig(),
    with_wb: bool = True,
    reduce: str = "device",
    mesh: Optional[jax.sharding.Mesh] = None,
) -> StreamedMosaicResult:
    """Exact WB + index statistics of a mosaic of ANY size on one chip.

    Args:
      bands: the mosaic — either a host (H, W, 3) uint8 array-like
        (sliced into ``band_rows`` bands; np.memmap streams from disk)
        or an iterable yielding (h_i, W, 3) uint8 bands (a decoder, a
        tile server, a synthetic generator).
      kinds: indices to analyze (one streaming pass covers all).
      band_rows: rows per band when ``bands`` is an array.
      with_wb: apply the reference's global percentile stretch before
        the index (process-images.py:893-902 flow).
      reduce: where the joint-histogram band reduction runs.
        ``"device"`` (default) streams referenced channels to the chip
        and contracts on the MXU — the production path on a real TPU
        host. ``"host"`` accumulates on the host via the native
        ``jointhist`` extension (numpy fallback) and never touches the
        device for the per-pixel work — the faster exact route when
        the host->device wire is orders of magnitude below DRAM
        bandwidth (e.g. this environment's tunnel; BENCHMARKS.md
        config 7 arithmetic). Both feed the identical 65536-bin
        closure, so results are bit-identical (tested).
      mesh: optional 1-D :class:`jax.sharding.Mesh` — shard each band's
        pixel axis across the mesh devices (``reduce="device"`` only):
        every chip contracts its own range and one psum of the
        (P, 256, 256) partial gathers the band. This is the true
        multi-chip gigapixel path (BASELINE config 5): per-pixel work
        and transfer scale 1/n_devices, only 256 KB/pair crosses ICI
        per band. Results are bit-identical to the unsharded path
        (integer histograms commute).

    Returns:
      :class:`StreamedMosaicResult` with exact global statistics.
    """
    if reduce not in ("device", "host"):
        raise ValueError(f"reduce must be 'device' or 'host', got {reduce!r}")
    if mesh is not None:
        if reduce != "device":
            raise ValueError("mesh sharding applies to reduce='device'")
        if len(mesh.axis_names) != 1:
            raise ValueError(
                f"analyze_mosaic_streamed shards over a 1-D mesh; got "
                f"axes {mesh.axis_names} — reshape to one axis"
            )
    kinds = tuple(IndexKind.parse(k) for k in kinds)
    pairs, lookup = _pair_layout(kinds)
    if isinstance(bands, np.ndarray) or hasattr(bands, "shape"):
        bands = iter_row_bands(bands, band_rows)

    # Transfer ONLY the channels the requested indices reference: the
    # joint-histogram reduction never reads an unreferenced channel, so
    # e.g. NDVI-only streams (R, NIR) — 2/3 of the bytes. Host->device
    # bandwidth is the binding resource of this path (BENCHMARKS.md
    # config 7 arithmetic), while the strided host compaction runs at
    # ~2 GB/s — ~40x the measured wire. ``pairs`` is remapped into the
    # compact column space for the device kernel; the 65536-bin closure
    # below keeps original channel ids.
    wire_channels = sorted({c for p in pairs for c in p})
    compact_pairs = tuple(
        (wire_channels.index(ia), wire_channels.index(ib))
        for ia, ib in pairs
    )
    n_wire = len(wire_channels)

    total = np.zeros((len(pairs), 256, 256), dtype=np.int64)
    n_pixels = 0
    n_bands = 0

    # A single band must stay below the flush window, or the per-band
    # accumulators wrap silently (int32 on device within a flush; one
    # uint32 bin on the host could wrap past 2^32 pixels): oversize
    # caller bands are re-split into row sub-bands here, so "band size
    # is caller-controlled" can never break exactness.
    def validated(bands):
        for band in bands:
            band = np.ascontiguousarray(band)
            if band.ndim != 3 or band.shape[-1] != 3 or band.dtype != np.uint8:
                raise ValueError(
                    f"bands must be (h, w, 3) uint8, got "
                    f"{band.shape} {band.dtype}"
                )
            if band.shape[0] * band.shape[1] > _FLUSH_AT:
                if band.shape[1] > _FLUSH_AT:
                    raise ValueError(
                        f"band rows of {band.shape[1]} pixels exceed the "
                        f"exact accumulation window ({_FLUSH_AT}); split "
                        "columns before streaming"
                    )
                rows_per = max(1, _FLUSH_AT // band.shape[1])
                for r0 in range(0, band.shape[0], rows_per):
                    yield band[r0:r0 + rows_per]
            else:
                yield band

    if reduce == "host":
        from rgnir_tpu.native import jointhist

        for band in validated(bands):
            n = band.shape[0] * band.shape[1]
            # a fresh uint32 accumulator per band: one band is always
            # far below any bin overflowing 2^32
            h32 = jointhist.accumulate(band.reshape(-1, 3), pairs)
            total += h32.astype(np.int64)
            n_pixels += n
            n_bands += 1
        if n_pixels == 0:
            raise ValueError("no bands")
        return _finalize(
            total, pairs, lookup, kinds, wb_cfg, idx_cfg, with_wb,
            n_pixels, n_bands,
        )

    acc = jnp.zeros((len(pairs), 256, 256), dtype=jnp.int32)
    pad_total = 0
    chunk = _CHUNK  # snapshot: pad accounting and kernel must agree
    n_dev = 1
    axis = sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        axis = mesh.axis_names[0]
        n_dev = mesh.devices.size
        sharding = NamedSharding(mesh, PartitionSpec(axis, None))

    # Double buffer: issue band i+1's transfer before awaiting band i's
    # reduction; JAX dispatch is async so the copy and the MXU overlap.
    # int32 on-device accumulation is exact within a flush window of
    # 2^31 pixels (flush_at, also the validated() band-split bound);
    # flush to the int64 host total before overflow.
    since_flush = 0
    pending = None
    for band in validated(bands):
        n = band.shape[0] * band.shape[1]
        flat = band.reshape(-1, 3)
        if n_wire < 3:
            compact = np.empty((flat.shape[0], n_wire), dtype=np.uint8)
            for j, c in enumerate(wire_channels):
                compact[:, j] = flat[:, c]
            flat = compact
        if mesh is not None:
            # Equal shards: pad the row count to the device count, then
            # each shard pads itself to the chunk multiple — all pads
            # land in bin [0, 0] and are subtracted below.
            shard_pad = -flat.shape[0] % n_dev
            if shard_pad:
                flat = np.concatenate(
                    [flat, np.zeros((shard_pad, flat.shape[1]), np.uint8)]
                )
            local_n = flat.shape[0] // n_dev
            pad_total += shard_pad + n_dev * (-local_n % chunk)
            nxt = jax.device_put(flat, sharding)
            if pending is not None:
                acc = _band_joint_hists_sharded(
                    pending, acc, compact_pairs, chunk, mesh, axis
                )
        else:
            pad_total += -n % chunk
            nxt = jax.device_put(flat)
            if pending is not None:
                acc = _band_joint_hists(pending, acc, compact_pairs, chunk)
        if since_flush + n > _FLUSH_AT:
            total += np.asarray(acc).astype(np.int64)
            acc = jnp.zeros((len(pairs), 256, 256), dtype=jnp.int32)
            since_flush = 0
        pending = nxt
        since_flush += n
        n_pixels += n
        n_bands += 1
    if pending is not None:
        if mesh is not None:
            acc = _band_joint_hists_sharded(
                pending, acc, compact_pairs, chunk, mesh, axis
            )
        else:
            acc = _band_joint_hists(pending, acc, compact_pairs, chunk)
    total += np.asarray(acc).astype(np.int64)
    if n_pixels == 0:
        raise ValueError("no bands")
    # Chunk padding added (0,0,0) pixels: every pair counted them in
    # bin [0, 0].
    total[:, 0, 0] -= pad_total
    return _finalize(
        total, pairs, lookup, kinds, wb_cfg, idx_cfg, with_wb,
        n_pixels, n_bands,
    )


def _finalize(
    total: np.ndarray,
    pairs: Tuple[Tuple[int, int], ...],
    lookup: Dict[IndexKind, Tuple[int, bool]],
    kinds: Sequence[IndexKind],
    wb_cfg: WBConfig,
    idx_cfg: IndexConfig,
    with_wb: bool,
    n_pixels: int,
    n_bands: int,
) -> StreamedMosaicResult:
    """The tiny 65536-bin closure shared by both reductions: WB LUTs
    from the joint-histogram marginals, index value grids, exact
    stats."""
    channels = sorted({c for p in pairs for c in p})
    marg: Dict[int, np.ndarray] = {}
    for pi, (ia, ib) in enumerate(pairs):
        marg.setdefault(ia, total[pi].sum(axis=1))
        marg.setdefault(ib, total[pi].sum(axis=0))
    wb_lo = np.full(3, np.nan, np.float32)
    wb_hi = np.full(3, np.nan, np.float32)
    luts: Dict[int, np.ndarray] = {}
    for ch in channels:
        if with_wb:
            hist_c = jnp.asarray(marg[ch].astype(np.int32))[None, :]
            lo, hi = (
                percentiles_from_histogram(
                    hist_c, (wb_cfg.p_low, wb_cfg.p_high), n=n_pixels
                )[..., i] for i in (0, 1)
            )
            # The SAME rescale op as the full-image path, applied to the
            # 256-value byte grid -> the exact uint8 LUT the in-HBM path
            # realizes pixelwise.
            lut = apply_white_balance_planar(
                jnp.arange(256, dtype=jnp.uint8).reshape(1, 1, 256),
                lo, hi, cfg=wb_cfg,
            )
            wb_lo[ch] = float(lo[0])
            wb_hi[ch] = float(hi[0])
            luts[ch] = np.asarray(lut).reshape(256)
        else:
            luts[ch] = np.arange(256, dtype=np.uint8)

    stats: Dict[str, IndexStats] = {}
    for kind in kinds:
        pi, swapped = lookup[kind]
        ia, ib = band_indices(kind)
        grid_a = luts[ia][:, None] * np.ones((1, 256), np.uint8)
        grid_b = luts[ib][None, :] * np.ones((256, 1), np.uint8)
        v = np.asarray(
            index_from_bands(
                jnp.asarray(grid_a), jnp.asarray(grid_b), cfg=idx_cfg
            )
        )
        joint = total[pi].T if swapped else total[pi]
        stats[kind.value] = _grid_stats(
            v.reshape(-1), joint.reshape(-1), kind, idx_cfg
        )
    return StreamedMosaicResult(
        stats=stats, wb_lo=wb_lo, wb_hi=wb_hi,
        n_pixels=n_pixels, bands=n_bands,
    )

"""Exact order statistics via radix-select — sort-free medians.

Global medians/percentiles of float32 data are order statistics, which
do not decompose over tiles/devices the way sums do (SURVEY.md section 7
"hard parts"), and a full ``jnp.sort`` is the single most expensive op
in the stats path. The TPU-native answer: map float32 to its
order-preserving uint32 key and radix-select the k-th smallest in
exactly 4 rounds; each round is a 256-bin histogram of one key byte,
computed on the MXU via the nibble tensor-product factorization
(rgnir_tpu.ops.histogram.nibble_product_histogram). Distributed use
adds one ``psum`` of 256 ints per round (rgnir_tpu.parallel.reduce).

Key map (standard IEEE-754 trick): non-negative floats get the sign
bit set; negative floats are bitwise-complemented. Strictly monotone
on distinct values (-0.0 keys just below +0.0, which float comparison
treats as equal — irrelevant for order statistics), so the selected
key inverts exactly to the float answer.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rgnir_tpu.ops.histogram import nibble_product_histogram


def ordered_u32_from_f32(x: jax.Array) -> jax.Array:
    """Monotone uint32 key of a float32 array (NaNs sort to the top)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    neg = bits >> 31 == 1
    return jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))


def f32_from_ordered_u32(key: jax.Array) -> jax.Array:
    """Inverse of :func:`ordered_u32_from_f32`."""
    key = key.astype(jnp.uint32)
    neg = key >> 31 == 0
    bits = jnp.where(neg, ~key, key & jnp.uint32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _byte_histogram(byte: jax.Array, active: jax.Array) -> jax.Array:
    """(..., 256) int32 histogram of byte values where ``active`` (MXU)."""
    return nibble_product_histogram(
        byte.astype(jnp.int32), active.astype(jnp.int32)
    )


def radix_order_statistic(
    vals: jax.Array,
    rank: jax.Array,
    mask: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    reduce_ndim: int = 1,
) -> jax.Array:
    """Exact ``rank``-th (0-indexed) smallest float32 across all shards.

    4 radix rounds over the order-preserving uint32 key, each a 256-bin
    MXU histogram of the active byte. The last ``reduce_ndim`` axes are
    the reduction domain; leading dims batch.

    Args:
      vals: local shard of values.
      rank: traced or static int32 global rank in [0, n_global),
        broadcastable to the batch shape.
      mask: local validity mask (padding exclusion), same shape as vals.
      axis_name: mesh axis to psum over (None = single device).
      reduce_ndim: how many trailing axes to reduce over (e.g. 2 for an
        ``(..., H, W)`` image domain).

    Returns:
      float32 of the batch shape, identical on every shard.
    """
    keys = ordered_u32_from_f32(vals)
    batch = keys.shape[: keys.ndim - reduce_ndim]
    keys = keys.reshape(batch + (-1,))
    if mask is not None:
        mask = mask.reshape(batch + (-1,))
    active = jnp.ones(keys.shape, bool) if mask is None else mask.astype(bool)
    rank = jnp.broadcast_to(jnp.asarray(rank, jnp.int32), batch)

    key, _ = _radix_select(keys, rank, active, axis_name)
    return f32_from_ordered_u32(key)


def _radix_select(keys, rank, active, axis_name):
    """Core radix rounds; returns (selected key, remaining count at/after
    the selected key within the final bin == count of elements equal to
    the key minus rank-within... specifically ``eq_count - rank_in_bin``,
    the number of copies of the selected key at ranks >= the target)."""
    prefix = jnp.zeros(keys.shape[:-1], jnp.uint32)
    eq_minus_rank = None
    for shift in (24, 16, 8, 0):
        shift = jnp.uint32(shift)
        byte = (keys >> shift).astype(jnp.uint32) & jnp.uint32(0xFF)
        hist = _byte_histogram(byte, active)  # (..., 256)
        if axis_name is not None:
            hist = jax.lax.psum(hist, axis_name)
        cdf = jnp.cumsum(hist, axis=-1)
        b = jnp.sum((cdf <= rank[..., None]).astype(jnp.int32), axis=-1)
        below = jnp.take_along_axis(
            cdf, jnp.maximum(b - 1, 0)[..., None], axis=-1
        )[..., 0]
        below = jnp.where(b > 0, below, 0)
        in_bin = jnp.take_along_axis(cdf, b[..., None], axis=-1)[..., 0] - below
        rank = rank - below
        active = active & (byte == b[..., None].astype(jnp.uint32))
        prefix = prefix | (b.astype(jnp.uint32) << shift)
        eq_minus_rank = in_bin - rank  # valid after the last round
    return prefix, eq_minus_rank


def adjacent_order_statistics(
    vals: jax.Array,
    rank: jax.Array,
    mask: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    reduce_ndim: int = 1,
) -> tuple:
    """Exact (a[rank], a[rank+1]) in one radix pass plus one reduction.

    After the final radix round the selected 32-bit key is fully
    resolved, so a[rank+1] == a[rank] iff more than one copy of the key
    sits at ranks >= target; otherwise a[rank+1] is the minimum key
    strictly greater than the selected one — a single masked min
    (``pmin`` when distributed), not a second 4-round select.
    """
    keys = ordered_u32_from_f32(vals)
    batch = keys.shape[: keys.ndim - reduce_ndim]
    keys = keys.reshape(batch + (-1,))
    if mask is not None:
        mask = mask.reshape(batch + (-1,))
    active = jnp.ones(keys.shape, bool) if mask is None else mask.astype(bool)
    rank = jnp.broadcast_to(jnp.asarray(rank, jnp.int32), batch)

    key_lo, eq_minus_rank = _radix_select(keys, rank, active, axis_name)
    # Min key strictly greater than key_lo (int64-free: keys < 2^32 via
    # uint32 compare; use max sentinel for excluded elements).
    gt = active & (keys > key_lo[..., None])
    candidates = jnp.where(gt, keys, jnp.uint32(0xFFFFFFFF))
    nxt = jnp.min(candidates, axis=-1)
    if axis_name is not None:
        nxt = jax.lax.pmin(nxt, axis_name)
    key_hi = jnp.where(eq_minus_rank >= 2, key_lo, nxt)
    return f32_from_ordered_u32(key_lo), f32_from_ordered_u32(key_hi)


def _digit16_histograms(
    digit: jax.Array, actives: jax.Array, chunk: int = 8192
) -> jax.Array:
    """k masked 65536-bin histograms in ONE pass over the data.

    ``digit``: (n,) int32 in [0, 65536); ``actives``: (k, n) bool.
    Chunked ``lax.scan``: per chunk, the two byte one-hots ((256, c)
    each) are contracted on the MXU into a (256, 256) joint count —
    the 16-bit generalization of the nibble tensor-product histogram.
    Per-chunk counts are exact in f32 (< 2^24) and accumulate in int32,
    so totals are exact up to 2^31-1 elements. Returns (k, 65536) int32.
    """
    k, n = actives.shape
    pad = (-n) % chunk
    if pad:
        digit = jnp.pad(digit, (0, pad))
        actives = jnp.pad(actives, ((0, 0), (0, pad)))
    nchunks = (n + pad) // chunk
    digit = digit.reshape(nchunks, chunk)
    actives = jnp.moveaxis(
        actives.reshape(k, nchunks, chunk), 1, 0
    )  # (nchunks, k, chunk)

    def body(acc, args):
        d, a = args  # (chunk,), (k, chunk)
        return acc + _digit16_chunk_counts(d, a), None

    acc0 = jnp.zeros((k, 65536), jnp.int32)
    out, _ = jax.lax.scan(body, acc0, (digit, actives))
    return out


def _digit16_chunk_counts(d: jax.Array, a: jax.Array) -> jax.Array:
    """(k, 65536) int32 masked counts of one chunk's 16-bit digits —
    the exactness-critical core shared by the scan bodies of
    :func:`_digit16_histograms` and
    :func:`_digit16_histograms_selected`: bf16 one-hots are EXACT
    (0/1), the MXU contraction accumulates in f32 (chunk < 2^24 keeps
    counts exact), and the int32 cast is lossless."""
    col = jnp.arange(256, dtype=jnp.int32)[:, None]
    k = a.shape[0]
    oh_lo = ((d & 255)[None, :] == col).astype(jnp.bfloat16)  # (256, c)
    oh_hi = ((d >> 8)[None, :] == col).astype(jnp.bfloat16)   # (256, c)
    ohq = oh_hi[None] * a[:, None, :].astype(jnp.bfloat16)    # (k,256,c)
    part = jnp.einsum(
        "qic,jc->qij", ohq, oh_lo,
        preferred_element_type=jnp.float32,
    )
    return part.reshape(k, 65536).astype(jnp.int32)


def _digit16_histograms_selected(
    digit: jax.Array,
    base_active: jax.Array,
    sel_digit: jax.Array,
    sel_values: jax.Array,
    chunk: int = 8192,
) -> jax.Array:
    """k masked 65536-bin histograms where row q's mask is
    ``base_active & (sel_digit == sel_values[q])``.

    Same one-pass MXU contraction as :func:`_digit16_histograms`, but
    the per-row actives are derived INSIDE the chunked scan — nothing
    of size (k, n) is ever materialized, bounding quantile-set memory
    at O(k * chunk) however dense ``sel_values`` is (the
    exact_quantiles pass-2 path; VERDICT round-2 weak #8).
    """
    n = digit.shape[0]
    pad = (-n) % chunk
    if pad:
        digit = jnp.pad(digit, (0, pad))
        base_active = jnp.pad(base_active, (0, pad))
        # padded rows match no sel value
        sel_digit = jnp.pad(sel_digit, (0, pad), constant_values=-1)
    digit = digit.reshape(-1, chunk)
    base_active = base_active.reshape(-1, chunk)
    sel_digit = sel_digit.reshape(-1, chunk)
    k = sel_values.shape[0]

    def body(acc, args):
        d, ba, sd = args  # (chunk,), (chunk,), (chunk,)
        a = ba[None, :] & (sd[None, :] == sel_values[:, None])  # (k, c)
        return acc + _digit16_chunk_counts(d, a), None

    acc0 = jnp.zeros((k, 65536), jnp.int32)
    out, _ = jax.lax.scan(body, acc0, (digit, base_active, sel_digit))
    return out


def _min_greater_chunked(
    keys: jax.Array,
    active: jax.Array,
    key_lo: jax.Array,
    chunk: int = 8192,
) -> jax.Array:
    """Per-row min key strictly greater than ``key_lo[q]`` (uint32 max
    sentinel when none), computed chunk-by-chunk so memory is bounded
    at O(Q * chunk) — the exact_quantiles pass-3 analogue of
    :func:`_digit16_histograms_selected`."""
    n = keys.shape[0]
    pad = (-n) % chunk
    if pad:
        keys = jnp.pad(keys, (0, pad))
        active = jnp.pad(active, (0, pad))
    keys = keys.reshape(-1, chunk)
    active = active.reshape(-1, chunk)

    def body(acc, args):
        kc, ac = args
        gt = ac[None, :] & (kc[None, :] > key_lo[:, None])
        cand = jnp.where(gt, kc[None, :], jnp.uint32(0xFFFFFFFF))
        return jnp.minimum(acc, jnp.min(cand, axis=-1)), None

    acc0 = jnp.full(key_lo.shape, jnp.uint32(0xFFFFFFFF), jnp.uint32)
    out, _ = jax.lax.scan(body, acc0, (keys, active))
    return out


def _rank_in_cdf(cdf: jax.Array, ranks: jax.Array):
    """bin index, count below it, and in-bin count for each rank.

    ``cdf``: (..., B) inclusive cumulative counts; ``ranks``: (...,).
    """
    b = jnp.sum((cdf <= ranks[..., None]).astype(jnp.int32), axis=-1)
    below = jnp.take_along_axis(
        cdf, jnp.maximum(b - 1, 0)[..., None], axis=-1
    )[..., 0]
    below = jnp.where(b > 0, below, 0)
    in_bin = jnp.take_along_axis(cdf, b[..., None], axis=-1)[..., 0] - below
    return b, below, in_bin


def exact_quantiles(
    vals: jax.Array,
    qs,
    n_valid: int,
    mask: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    reduce_ndim: int = 1,
) -> jax.Array:
    """General exact quantiles of arbitrary float32 data, sort-free.

    np.percentile (linear, array-q float64-gamma) semantics: for each
    static q the rank split ``k = floor(q/100*(n-1))``, gamma computed
    at trace time in exact float64, and the lerp in f32 (<= 1 ulp of
    numpy). Generalizes the uint8-histogram percentiles of
    ops.histogram to any float32 data, including sharded (psum'd
    histograms / pmin).

    THREE data passes total, independent of ``len(qs)`` (vs one 4-round
    radix select per quantile):

    1. shared 65536-bin histogram of the keys' high 16 bits — locates
       every quantile's high bin and residual rank at once;
    2. per-quantile 65536-bin histograms of the low 16 bits restricted
       to each quantile's high bin — all quantiles in one pass
       (:func:`_digit16_histograms`) — fully resolving each key;
    3. per-quantile masked min of keys strictly greater (the a[rank+1]
       interpolation neighbour), all quantiles in one pass.

    Memory is bounded at O(len(qs) * 8192) for the per-quantile
    passes (the (Q, N) masks are derived inside the chunked scans),
    so dense quantile sets are safe at any data size.

    Returns ``batch_shape + (len(qs),)`` float32.
    """
    import numpy as _np

    keys = ordered_u32_from_f32(vals)
    batch = keys.shape[: keys.ndim - reduce_ndim]
    keys = keys.reshape(batch + (-1,))
    if mask is not None:
        mask = mask.reshape(batch + (-1,))
    active = jnp.ones(keys.shape, bool) if mask is None else mask.astype(bool)

    ranks_list, gammas = [], []
    for q in qs:
        vi = (float(q) / 100.0) * (n_valid - 1)
        k = int(_np.floor(vi))
        ranks_list.append(k)
        gammas.append(vi - k)
    ranks0 = jnp.asarray(ranks_list, jnp.int32)          # (Q,)
    t = jnp.asarray(gammas, jnp.float32)                 # (Q,)
    exact_hit = jnp.asarray([g == 0.0 for g in gammas])  # (Q,) bool

    def single(keys1: jax.Array, active1: jax.Array) -> jax.Array:
        hi16 = (keys1 >> jnp.uint32(16)).astype(jnp.int32)
        lo16 = (keys1 & jnp.uint32(0xFFFF)).astype(jnp.int32)
        # pass 1: shared high-16 histogram
        h1 = _digit16_histograms(hi16, active1[None, :])[0]
        if axis_name is not None:
            h1 = jax.lax.psum(h1, axis_name)
        b1, below1, _ = _rank_in_cdf(
            jnp.cumsum(h1)[None, :].repeat(ranks0.shape[0], 0), ranks0
        )
        rank1 = ranks0 - below1
        # pass 2: per-quantile low-16 histograms inside each high bin.
        # The per-quantile masks are derived inside the chunked scan —
        # O(Q * chunk) memory, never (Q, N).
        h2 = _digit16_histograms_selected(
            lo16, active1, hi16, b1
        )                                                # (Q, 65536)
        if axis_name is not None:
            h2 = jax.lax.psum(h2, axis_name)
        b2, below2, in_bin = _rank_in_cdf(jnp.cumsum(h2, axis=-1), rank1)
        rank2 = rank1 - below2
        eq_minus_rank = in_bin - rank2
        key_lo = (
            b1.astype(jnp.uint32) << jnp.uint32(16)
        ) | b2.astype(jnp.uint32)                        # (Q,)
        # pass 3: min key strictly greater (for the lerp neighbour),
        # chunk-bounded like pass 2
        nxt = _min_greater_chunked(keys1, active1, key_lo)
        if axis_name is not None:
            nxt = jax.lax.pmin(nxt, axis_name)
        key_hi = jnp.where(eq_minus_rank >= 2, key_lo, nxt)
        lo = f32_from_ordered_u32(key_lo)
        hi = f32_from_ordered_u32(key_hi)
        diff = hi - lo
        lerp = jnp.where(t >= 0.5, hi - diff * (1.0 - t), lo + diff * t)
        # gamma == 0: the answer is a[rank] exactly (and the sentinel
        # successor key may be NaN when rank == n-1) — bypass the lerp.
        return jnp.where(exact_hit, lo, lerp)

    fn = single
    for _ in batch:
        fn = jax.vmap(fn)
    return fn(keys, active)


def masked_median(
    vals: jax.Array,
    n_valid: int,
    mask: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    reduce_ndim: int = 1,
) -> jax.Array:
    """Exact global median (numpy semantics: mean of the two middle order
    statistics for even n) of sharded float32 data. Batched like
    :func:`radix_order_statistic`. Even n uses the one-pass adjacent-rank
    select (4 rounds + one min) instead of two full selects."""
    if n_valid % 2 == 1:
        return radix_order_statistic(
            vals, (n_valid - 1) // 2, mask, axis_name, reduce_ndim
        )
    lo, hi = adjacent_order_statistics(
        vals, (n_valid - 1) // 2, mask, axis_name, reduce_ndim
    )
    return (lo + hi) * 0.5

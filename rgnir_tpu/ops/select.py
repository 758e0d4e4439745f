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
    static q the rank split ``k = floor(q/100*(n-1))``, gamma is
    computed at trace time in exact float64; the two adjacent order
    statistics come from ONE radix-select + one masked-min per q
    (adjacent-rank fast path), and the lerp runs in f32 (<= 1 ulp of
    numpy). Generalizes the uint8-histogram percentiles of
    ops.histogram to any float32 data, including sharded (psum rounds).

    Returns ``batch_shape + (len(qs),)`` float32.
    """
    import numpy as _np

    keys = ordered_u32_from_f32(vals)
    batch = keys.shape[: keys.ndim - reduce_ndim]
    keys = keys.reshape(batch + (-1,))
    if mask is not None:
        mask = mask.reshape(batch + (-1,))
    active = jnp.ones(keys.shape, bool) if mask is None else mask.astype(bool)

    outs = []
    for q in qs:
        vi = (float(q) / 100.0) * (n_valid - 1)
        k = int(_np.floor(vi))
        d = vi - k
        rank = jnp.broadcast_to(jnp.int32(k), batch)
        key_lo, eq_minus_rank = _radix_select(keys, rank, active, axis_name)
        lo = f32_from_ordered_u32(key_lo)
        if d == 0.0:
            outs.append(lo)
            continue
        gt = active & (keys > key_lo[..., None])
        candidates = jnp.where(gt, keys, jnp.uint32(0xFFFFFFFF))
        nxt = jnp.min(candidates, axis=-1)
        if axis_name is not None:
            nxt = jax.lax.pmin(nxt, axis_name)
        key_hi = jnp.where(eq_minus_rank >= 2, key_lo, nxt)
        hi = f32_from_ordered_u32(key_hi)
        t = jnp.float32(d)
        diff = hi - lo
        outs.append(
            jnp.where(t >= 0.5, hi - diff * (1.0 - t), lo + diff * t)
        )
    return jnp.stack(outs, axis=-1)


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

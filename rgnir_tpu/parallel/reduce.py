"""Distributed exact order statistics via radix-select.

Global medians/percentiles of sharded float32 data are *order*
statistics, which do not decompose over shards the way sums do
(SURVEY.md section 7 "hard parts"). The TPU-native answer: map float32
to its order-preserving uint32 key and radix-select the k-th smallest
in exactly 4 rounds; each round is a 256-bin histogram of one key byte
— a local reduction plus one ``psum`` over the mesh axis. No sort, no
gather of the data, communication is 4 x 256 ints per device.

Key map (standard IEEE-754 trick): non-negative floats get the sign
bit set; negative floats are bitwise-complemented. Strictly monotone,
so the selected key inverts exactly to the float answer.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


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
    """(256,) int32 histogram of uint32 byte values where ``active``."""
    levels = jnp.arange(256, dtype=jnp.uint32)
    flat_b = byte.reshape(-1)
    flat_a = active.reshape(-1)
    eq = (flat_b[:, None] == levels[None, :]) & flat_a[:, None]
    return jnp.sum(eq.astype(jnp.int32), axis=0)


def radix_order_statistic(
    vals: jax.Array,
    rank: jax.Array,
    mask: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Exact ``rank``-th (0-indexed) smallest float32 across all shards.

    Args:
      vals: local shard of values (any shape).
      rank: traced or static int32 global rank in [0, n_global).
      mask: local validity mask (padding exclusion).
      axis_name: mesh axis to psum over (None = single device).

    Returns:
      float32 scalar, identical on every shard.
    """
    keys = ordered_u32_from_f32(vals)
    active0 = (
        jnp.ones(keys.shape, bool) if mask is None else mask.astype(bool)
    )
    rank = jnp.asarray(rank, jnp.int32)

    def round_fn(carry, shift):
        active, rank, prefix = carry
        byte = (keys >> shift).astype(jnp.uint32) & jnp.uint32(0xFF)
        hist = _byte_histogram(byte, active)
        if axis_name is not None:
            hist = jax.lax.psum(hist, axis_name)
        cdf = jnp.cumsum(hist)
        b = jnp.sum((cdf <= rank).astype(jnp.int32))  # selected byte value
        below = jnp.where(b > 0, jnp.take(cdf, b - 1, mode="clip"), 0)
        new_rank = rank - below
        new_active = active & (byte == b.astype(jnp.uint32))
        new_prefix = prefix | (b.astype(jnp.uint32) << shift)
        return (new_active, new_rank, new_prefix), None

    carry = (active0, rank, jnp.uint32(0))
    for shift in (24, 16, 8, 0):
        carry, _ = round_fn(carry, jnp.uint32(shift))
    _, _, prefix = carry
    return f32_from_ordered_u32(prefix)


def masked_median(
    vals: jax.Array,
    n_valid: int,
    mask: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Exact global median (numpy semantics: mean of the two middle order
    statistics for even n) of sharded float32 data."""
    lo = radix_order_statistic(vals, (n_valid - 1) // 2, mask, axis_name)
    if n_valid % 2 == 1:
        return lo
    hi = radix_order_statistic(vals, n_valid // 2, mask, axis_name)
    return (lo + hi) * 0.5

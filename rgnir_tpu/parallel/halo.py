"""Bounded halo exchange for row-sharded mosaics (SURVEY.md sections 5,
7: the only cross-tile dependence this workload ever has is the bounded
support of resampling/alignment stencils — no ring pipelines needed,
just one neighbor edge swap).

Implemented with ``jax.lax.ppermute`` inside ``shard_map``: each shard
sends its top ``halo`` rows to its upper neighbor and its bottom rows to
its lower neighbor, receiving the mirror. Boundary shards get
edge-replicated rows (matching 'nearest'-style stencil clamping) so the
output shape is uniform across devices.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def exchange_row_halos(
    shard: jax.Array,
    halo: int,
    axis_name: str,
) -> jax.Array:
    """Return ``shard`` extended with ``halo`` rows from each neighbor.

    Args:
      shard: local ``(rows, ...)`` block of a row-sharded array (call
        inside shard_map).
      halo: number of boundary rows to exchange (must be <= rows).
      axis_name: the sharded mesh axis.

    Returns:
      ``(rows + 2*halo, ...)`` array: [top halo | shard | bottom halo].
      The first shard's top halo and last shard's bottom halo replicate
      their own edge rows (stencil clamp).
    """
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    # send my TOP rows up (so the neighbor below me receives them as its
    # bottom halo), and my BOTTOM rows down.
    top_rows = shard[:halo]
    bot_rows = shard[-halo:]

    # ppermute: perm entries are (source, destination) pairs.
    down = [(i, i + 1) for i in range(n_dev - 1)]  # my bottom -> next's top
    up = [(i, i - 1) for i in range(1, n_dev)]     # my top -> prev's bottom

    recv_top = jax.lax.ppermute(bot_rows, axis_name, down)   # from i-1
    recv_bot = jax.lax.ppermute(top_rows, axis_name, up)     # from i+1

    # Boundary clamp: shard 0 has no upper neighbor, last has no lower.
    first_edge = jnp.broadcast_to(shard[:1], top_rows.shape)
    last_edge = jnp.broadcast_to(shard[-1:], bot_rows.shape)
    recv_top = jax.lax.select(
        jnp.broadcast_to(idx == 0, recv_top.shape), first_edge, recv_top
    )
    recv_bot = jax.lax.select(
        jnp.broadcast_to(idx == n_dev - 1, recv_bot.shape),
        last_edge, recv_bot,
    )
    return jnp.concatenate([recv_top, shard, recv_bot], axis=0)

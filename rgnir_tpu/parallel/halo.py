"""Bounded halo exchange for sharded mosaics (SURVEY.md sections 5,
7: the only cross-tile dependence this workload ever has is the bounded
support of resampling/alignment stencils — no ring pipelines needed,
just one neighbor edge swap per sharded dimension).

Implemented with ``jax.lax.ppermute`` inside ``shard_map``: each shard
sends its leading ``halo`` slices to its upper neighbor and its trailing
slices to its lower neighbor, receiving the mirror. Boundary shards get
edge-replicated slices (matching 'nearest'-style stencil clamping) so
the output shape is uniform across devices. 2-D meshes compose two
exchanges (rows then columns); exchanging columns of the already
row-extended block carries the diagonal corners automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exchange_halos(
    shard: jax.Array,
    halo: int,
    axis_name: str,
    dim: int = 0,
) -> jax.Array:
    """Return ``shard`` extended along ``dim`` with ``halo`` slices from
    each mesh neighbor on ``axis_name``.

    Args:
      shard: local block of a sharded array (call inside shard_map).
      halo: number of boundary slices to exchange (<= shard.shape[dim]).
      axis_name: the mesh axis the array dimension ``dim`` is sharded on.
      dim: which array dimension to extend.

    Returns:
      ``shard`` with ``shape[dim] + 2*halo``: [upper halo | shard |
      lower halo]. The first shard's upper halo and last shard's lower
      halo replicate their own edge slices (stencil clamp).
    """
    if dim != 0:
        moved = jnp.moveaxis(shard, dim, 0)
        return jnp.moveaxis(
            exchange_halos(moved, halo, axis_name, dim=0), 0, dim
        )

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


def exchange_row_halos(
    shard: jax.Array,
    halo: int,
    axis_name: str,
) -> jax.Array:
    """Row special case of :func:`exchange_halos` (dim=0)."""
    return exchange_halos(shard, halo, axis_name, dim=0)

"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh


def make_mesh(
    shape: Tuple[int, ...], axis_names: Tuple[str, ...]
) -> Mesh:
    """A Mesh over the first prod(shape) visible devices."""
    return jax.make_mesh(shape, axis_names)


def local_mesh(axis_name: str = "d", n: Optional[int] = None) -> Mesh:
    """1-D mesh over all (or n) visible devices."""
    devs = jax.devices()
    n = len(devs) if n is None else n
    return jax.make_mesh((n,), (axis_name,))

"""Normalized-difference indices (reference: process-images.py:449-490).

Band layout contract: channel 0 = Red, 1 = Green, 2 = NIR
(process-images.py:459-461). All indices are computed in float32 with
``eps = 1e-10`` added to the denominator (process-images.py:464) and
clipped to [-1, 1] (process-images.py:490):

    NDVI  = (NIR - R) / (NIR + R + eps)
    GNDVI = (NIR - G) / (NIR + G + eps)
    NDWI  = (G - NIR) / (G + NIR + eps)
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from rgnir_tpu.config import IndexConfig, IndexKind

# (positive band, negative band) channel indices per builtin kind.
BAND_INDICES = {
    IndexKind.NDVI: (2, 0),   # NIR, R
    IndexKind.GNDVI: (2, 1),  # NIR, G
    IndexKind.NDWI: (1, 2),   # G, NIR
}
_BANDS = BAND_INDICES


def band_indices(kind) -> Tuple[int, int]:
    """(positive, negative) channel pair of a builtin ``IndexKind`` or
    a ``config.CustomIndex`` (which carries its own ``bands``)."""
    bands = getattr(kind, "bands", None)
    if bands is not None:
        return bands
    return BAND_INDICES[kind]


def index_from_bands(
    a: jax.Array, b: jax.Array, cfg: IndexConfig = IndexConfig()
) -> jax.Array:
    """``clip((a - b) / (a + b + eps), -1, 1)`` in float32."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    return jnp.clip((a - b) / (a + b + cfg.eps), cfg.clip_lo, cfg.clip_hi)


@functools.partial(jax.jit, static_argnames=("kind", "cfg"))
def compute_index(
    img: jax.Array,
    kind: Union[IndexKind, str],
    cfg: IndexConfig = IndexConfig(),
) -> jax.Array:
    """Index map of an ``(..., H, W, C)`` image; returns ``(..., H, W)`` f32.

    ``kind`` must be static (resolved at trace time), mirroring the
    reference's ``index_type`` string dispatch (process-images.py:466-485
    raises ValueError on unknown types — so do we, via IndexKind.parse).
    """
    kind = IndexKind.parse(kind)
    ia, ib = band_indices(kind)
    return index_from_bands(img[..., ia], img[..., ib], cfg)


def compute_indices(
    img: jax.Array,
    kinds: Sequence[Union[IndexKind, str]],
    cfg: IndexConfig = IndexConfig(),
) -> Tuple[jax.Array, ...]:
    """All requested index maps in one traced pass (bands read once)."""
    return tuple(compute_index(img, k, cfg) for k in kinds)

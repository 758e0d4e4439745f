"""Colormap rendering via baked matplotlib LUTs.

Reference renders index maps with ``imshow(index, cmap, vmin=-1, vmax=1)``
(process-images.py:690-697) — RdYlGn for vegetation indices, RdYlBu for
NDWI, and bwr with +/-0.5 for change maps (process-images.py:954-959).

TPU-native design: the matplotlib colormap is a 256-entry RGBA byte LUT
(baked once at build time, rgnir_tpu/color/_bake.py); rendering is a
normalize + floor + gather on device — bit-identical to
``ScalarMappable.to_rgba(..., bytes=True)`` (verified: index =
``min(int(norm * 256), 255)``, bytes = truncation of ``lut * 255``).
The figure-level composition (colorbars, titles) stays host-side in
rgnir_tpu.viz; this op is the per-pixel data plane.
"""

from __future__ import annotations

import functools
from typing import Union

import jax
import jax.numpy as jnp

from rgnir_tpu.color import get_lut
from rgnir_tpu.config import IndexKind


def lut_indices(
    values: jax.Array, vmin: float, vmax: float, n: int = 256
) -> jax.Array:
    """Matplotlib LUT index: ``min(floor((v - vmin)/(vmax - vmin) * n), n-1)``,
    clipped to [0, n-1] (under/over map to the end colors, as mpl does
    for clipped data)."""
    norm = (values.astype(jnp.float32) - vmin) * (1.0 / (vmax - vmin))
    idx = jnp.floor(norm * n).astype(jnp.int32)
    return jnp.clip(idx, 0, n - 1)


@functools.partial(
    jax.jit, static_argnames=("cmap", "vmin", "vmax", "alpha")
)
def render_colormap(
    values: jax.Array,
    cmap: Union[IndexKind, str] = IndexKind.NDVI,
    vmin: float = -1.0,
    vmax: float = 1.0,
    alpha: bool = False,
) -> jax.Array:
    """Colormapped uint8 image of ``(..., H, W)`` values.

    Args:
      cmap: an IndexKind (uses its reference colormap) or a colormap
        name ("RdYlGn", "RdYlBu", "bwr", "gray", "viridis").
      vmin/vmax: imshow limits (reference: -1/1 for indices, +/-0.5 for
        change maps).
      alpha: include the alpha channel -> (..., H, W, 4); default RGB.

    Returns:
      ``(..., H, W, 3 or 4)`` uint8.
    """
    if isinstance(cmap, IndexKind) or (
        isinstance(cmap, str) and cmap.upper() in IndexKind.__members__
    ):
        name = IndexKind.parse(cmap).cmap_name
    else:
        name = str(cmap)
    lut = jnp.asarray(get_lut(name))  # (256, 4) uint8
    if not alpha:
        lut = lut[:, :3]
    idx = lut_indices(values, vmin, vmax, n=lut.shape[0])
    return jnp.take(lut, idx, axis=0)

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

    TPU-native LUT application: per-pixel table gathers are pathologically
    slow on TPU (~60x slower than this, measured), so the 256-entry LUT
    lookup is factored through nibble one-hots onto the MXU:
    ``lut[i] = sum_{h,l} [i>>4==h][i&15==l] * lut[h*16+l]``, i.e. a
    (N,16) x (16, 16*C) matmul followed by a tiny per-pixel contraction.
    Exact: one-hots are 0/1, LUT bytes (<= 255) are exactly representable
    in bf16, and float32 accumulates single nonzero terms exactly.

    Args:
      cmap: an IndexKind or registered CustomIndex (uses that kind's
        colormap), the name of a registered custom index, or a
        matplotlib colormap name ("RdYlGn", "RdYlBu", "bwr", ... —
        names outside the baked set are baked on first use).
      vmin/vmax: imshow limits (reference: -1/1 for indices, +/-0.5 for
        change maps).
      alpha: include the alpha channel -> (..., H, W, 4); default RGB.

    Returns:
      ``(..., H, W, 3 or 4)`` uint8.
    """
    if not isinstance(cmap, str):
        name = cmap.cmap_name  # IndexKind or CustomIndex
    else:
        try:
            name = IndexKind.parse(cmap).cmap_name
        except ValueError:  # not an index name: a raw colormap name
            name = str(cmap)
    lut = get_lut(name)  # (256, 4) uint8 numpy
    if not alpha:
        lut = lut[:, :3]
    c = lut.shape[1]
    h_dim, w_dim = values.shape[-2], values.shape[-1]
    batch = values.shape[:-2]

    idx = lut_indices(values, vmin, vmax, n=256).reshape(batch + (-1,))
    nib = jnp.arange(16, dtype=jnp.int32)
    oh_hi = ((idx >> 4)[..., None] == nib).astype(jnp.bfloat16)
    oh_lo = ((idx & 15)[..., None] == nib).astype(jnp.bfloat16)
    # T: hi-nibble -> the 16 candidate colors of that row, flattened.
    table = jnp.asarray(
        lut.reshape(16, 16 * c).astype("float32"), dtype=jnp.bfloat16
    )
    tmp = jnp.einsum(
        "...nh,hk->...nk", oh_hi, table, preferred_element_type=jnp.float32
    ).reshape(batch + (-1, 16, c))
    rgb = jnp.einsum(
        "...nl,...nlc->...nc", oh_lo.astype(jnp.float32), tmp
    )
    return rgb.astype(jnp.uint8).reshape(batch + (h_dim, w_dim, c))

"""Tiled local shift refinement for non-rigid mosaics.

The reference's alignment (process-images.py:515-565) estimates ONE
rigid translation for the whole scene. UAV mosaics stitched from many
frames drift non-rigidly: the residual shift varies smoothly across the
image. This module estimates a per-tile residual shift FIELD and warps
with its bilinear interpolation — a TPU-shaped coarse optical flow:

- the per-tile phase correlations are one *batched* FFT (``vmap`` over
  tiles — large, static-shaped, MXU/VPU-friendly),
- the field-interpolated warp is separable lerps plus four gathers,
  all fused by XLA into one pass.

Everything is static-shaped and jittable; nothing here syncs to host.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rgnir_tpu.register.phase import luminance, phase_correlation_shift
from rgnir_tpu.register.warp import _reflect_index


def _to_gray(img: jax.Array) -> jax.Array:
    return luminance(img)  # handles both (H, W) and (H, W, 3)


@functools.partial(
    jax.jit, static_argnames=("tile", "upsample_factor", "max_shift")
)
def local_shift_field(
    fixed: jax.Array,
    moving: jax.Array,
    tile: Tuple[int, int] = (256, 256),
    upsample_factor: int = 1,
    max_shift: Optional[float] = None,
) -> jax.Array:
    """Per-tile (dy, dx) aligning ``moving`` to ``fixed``, tile by tile.

    Args:
      fixed/moving: ``(H, W)`` grayscale or ``(H, W, 3)`` images (uint8
        or float; RGB is projected by :func:`luminance`).
      tile: tile height/width. The image is edge-padded up to a tile
        multiple; tiles are disjoint.
      upsample_factor: subpixel refinement per tile (upsampled DFT).
      max_shift: clamp each component to ``+/-max_shift`` — rejects the
        wild estimates low-texture tiles produce (a translation larger
        than the expected drift is always spurious). Default: tile/4.

    Returns:
      ``(TY, TX, 2)`` float32 field of per-tile ``(dy, dx)``.
    """
    fg = _to_gray(fixed)
    mg = _to_gray(moving)
    th, tw = tile
    h, w = fg.shape
    ty, tx = -(-h // th), -(-w // tw)
    pad = ((0, ty * th - h), (0, tx * tw - w))
    fg = jnp.pad(fg, pad, mode="edge")
    mg = jnp.pad(mg, pad, mode="edge")

    def tiles(x):
        return (
            x.reshape(ty, th, tx, tw).transpose(0, 2, 1, 3)
            .reshape(ty * tx, th, tw)
        )

    est = jax.vmap(
        lambda f, m: phase_correlation_shift(
            f, m, upsample_factor=upsample_factor
        )
    )(tiles(fg), tiles(mg))  # (ty*tx, 2)
    field = est.reshape(ty, tx, 2)
    bound = (min(th, tw) / 4.0) if max_shift is None else float(max_shift)
    return jnp.clip(field, -bound, bound)


def interpolate_field(
    field: jax.Array,
    h: int,
    w: int,
    tile: Tuple[int, int],
    row0=0,
    col0=0,
) -> jax.Array:
    """Bilinearly interpolate a ``(TY, TX, 2)`` tile field to per-pixel
    ``(H, W, 2)`` shifts. Field samples sit at tile centers; pixels
    outside the outermost centers clamp (constant extrapolation).

    ``row0``/``col0`` offset the pixel window into a GLOBAL field —
    sharded callers (parallel.change.field_warp_haloed) sample their
    shard's window ``[row0, row0+h) x [col0, col0+w)`` of the
    all_gathered field; 0 (the default, exact: ``0.0 + arange`` is the
    identity) is the unsharded whole-image case."""
    ty, tx = field.shape[0], field.shape[1]
    th, tw = tile

    def axis_weights(n, off, t, m):
        # pixel coordinate -> field coordinate (centers at t/2 - 0.5)
        f = (
            jnp.asarray(off, jnp.float32)
            + jnp.arange(n, dtype=jnp.float32)
            - (t - 1) / 2.0
        ) / t
        f = jnp.clip(f, 0.0, m - 1.0)
        f0 = jnp.floor(f)
        frac = f - f0
        i0 = f0.astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, m - 1)
        return i0, i1, frac

    y0, y1, wy = axis_weights(h, row0, th, ty)
    x0, x1, wx = axis_weights(w, col0, tw, tx)
    rows0 = jnp.take(field, y0, axis=0)
    rows1 = jnp.take(field, y1, axis=0)
    rowmix = rows0 * (1.0 - wy)[:, None, None] + rows1 * wy[:, None, None]
    cols0 = jnp.take(rowmix, x0, axis=1)
    cols1 = jnp.take(rowmix, x1, axis=1)
    return cols0 * (1.0 - wx)[None, :, None] + cols1 * wx[None, :, None]


@functools.partial(jax.jit, static_argnames=("tile",))
def warp_with_field(
    img: jax.Array,
    field: jax.Array,
    tile: Tuple[int, int],
) -> jax.Array:
    """Warp ``img`` by the bilinear interpolation of a per-tile shift
    field: ``out[y, x] = img[y - dy(y,x), x - dx(y,x)]`` with bilinear
    sampling and reflect boundaries. A constant field reduces exactly
    to :func:`rgnir_tpu.register.warp.bilinear_shift_2d`.

    Args:
      img: ``(H, W)`` or ``(H, W, C)``.
      field: ``(TY, TX, 2)`` from :func:`local_shift_field` (a global
        shift may be folded in by adding it to every tile).
      tile: the tile shape the field was estimated on.
    """
    h, w = img.shape[0], img.shape[1]
    x = img.astype(jnp.float32)
    shifts = interpolate_field(field, h, w, tile)  # (H, W, 2)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - shifts[..., 0]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - shifts[..., 1]

    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    wy = yy - y0  # (H, W)
    wx = xx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y0r = _reflect_index(y0i, h)
    y1r = _reflect_index(y0i + 1, h)
    x0r = _reflect_index(x0i, w)
    x1r = _reflect_index(x0i + 1, w)

    if x.ndim == 3:
        wy = wy[..., None]
        wx = wx[..., None]
    v00 = x[y0r, x0r]
    v01 = x[y0r, x1r]
    v10 = x[y1r, x0r]
    v11 = x[y1r, x1r]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


@functools.partial(
    jax.jit, static_argnames=("tile", "upsample_factor", "max_residual")
)
def align_images_local(
    fixed: jax.Array,
    moving: jax.Array,
    tile: Tuple[int, int] = (256, 256),
    upsample_factor: int = 1,
    max_residual: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Global + tiled-residual alignment of ``moving`` onto ``fixed``.

    Two stages, both on device: a whole-image phase correlation gives
    the rigid translation; per-tile phase correlations on the
    *globally pre-aligned* image estimate the smooth non-rigid residual
    (clamped to ``max_residual``, default tile/4); one field warp
    applies ``global + residual`` in a single resampling pass (no
    double interpolation).

    Returns ``(aligned_float32, global_shift (2,), field (TY, TX, 2))``
    where ``field`` already includes the global shift.
    """
    fg = _to_gray(fixed)
    mg = _to_gray(moving)
    g = phase_correlation_shift(fg, mg, upsample_factor=upsample_factor)
    # Residuals measured on the pre-aligned image: integer-shift the
    # grayscale by the rounded global shift with REFLECT indexing (a
    # jnp.roll would wrap rows/columns from the opposite edge into the
    # border tiles and contaminate their residual estimates, up to the
    # clamp). Reflected borders are locally plausible, so border tiles
    # correlate against near-zero residuals like interior ones.
    gy = jnp.round(g[0]).astype(jnp.int32)
    gx = jnp.round(g[1]).astype(jnp.int32)
    gh, gw = mg.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0) - gy
    xx = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1) - gx
    mg_shift = mg[_reflect_index(yy, gh), _reflect_index(xx, gw)]
    resid = local_shift_field(
        fg, mg_shift, tile=tile, upsample_factor=upsample_factor,
        max_shift=max_residual,
    )
    # Tiles whose content mostly left the frame under the global shift
    # (or lies in the edge-padded remainder) have no real signal to
    # correlate — reflect padding keeps them from seeing *wrong* pixels
    # but cannot invent the departed ones, and their residuals are
    # noise up to the clamp. Gate: a tile keeps its residual only when
    # >= 50% of its area maps to real overlap; otherwise the global
    # shift (the best available estimate there) stands alone.
    th, tw = tile
    ty, tx = resid.shape[0], resid.shape[1]
    lo_y, hi_y = jnp.maximum(0, gy), jnp.minimum(gh, gh + gy)
    lo_x, hi_x = jnp.maximum(0, gx), jnp.minimum(gw, gw + gx)
    y0 = jnp.arange(ty, dtype=jnp.int32) * th
    x0 = jnp.arange(tx, dtype=jnp.int32) * tw
    vy = jnp.clip(jnp.minimum(hi_y, y0 + th) - jnp.maximum(lo_y, y0), 0, th)
    vx = jnp.clip(jnp.minimum(hi_x, x0 + tw) - jnp.maximum(lo_x, x0), 0, tw)
    frac = (vy[:, None] * vx[None, :]).astype(jnp.float32) / float(th * tw)
    resid = jnp.where(frac[..., None] >= 0.5, resid, 0.0)
    field = resid + jnp.stack([gy, gx]).astype(jnp.float32)
    aligned = warp_with_field(moving, field, tile)
    return aligned, g, field

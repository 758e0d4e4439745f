"""Bilinear shift resampling with reflect boundaries.

Parity target: ``scipy.ndimage.shift(img, shift, order=1, mode='reflect')``
(reference call at process-images.py:559). ``output[i] = input[i - shift]``
with bilinear (order=1) interpolation and half-sample-symmetric
('reflect') boundary handling.

Implemented directly as a gather + lerp rather than through
``jax.scipy.ndimage.map_coordinates`` so the reflect index math is
explicit, static-shaped, and fuses into one pass on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _reflect_index(idx: jax.Array, n: int) -> jax.Array:
    """Half-sample symmetric reflection of integer indices into [0, n).

    Pattern for n=4: ... 1 0 | 0 1 2 3 | 3 2 ... (scipy mode='reflect').
    """
    if n == 1:
        return jnp.zeros_like(idx)
    period = 2 * n
    m = jnp.mod(idx, period)
    m = jnp.where(m < 0, m + period, m)
    return jnp.where(m >= n, period - 1 - m, m)


def bilinear_shift_2d(img: jax.Array, dy: jax.Array, dx: jax.Array) -> jax.Array:
    """Shift a ``(H, W)`` or ``(H, W, C)`` image by (dy, dx), bilinear+reflect.

    dy/dx may be traced floats (dynamic shifts from phase correlation
    stay on device — no host sync).
    """
    h, w = img.shape[0], img.shape[1]
    x = img.astype(jnp.float32)

    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - dy  # source row coords
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - dx

    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    wy = yy - y0  # (H, 1)
    wx = xx - x0  # (1, W)

    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y0r = _reflect_index(y0i, h)
    y1r = _reflect_index(y0i + 1, h)
    x0r = _reflect_index(x0i, w)
    x1r = _reflect_index(x0i + 1, w)

    # Row gathers then column gathers — a shift has separable coords, so
    # this is 2 gathers along each axis instead of 4 full 2-D gathers.
    rows0 = jnp.take(x, y0r[:, 0], axis=0)
    rows1 = jnp.take(x, y1r[:, 0], axis=0)
    wy_b = wy if x.ndim == 2 else wy[..., None]
    rowmix = rows0 * (1.0 - wy_b) + rows1 * wy_b  # (H, W[, C])

    cols0 = jnp.take(rowmix, x0r[0, :], axis=1)
    cols1 = jnp.take(rowmix, x1r[0, :], axis=1)
    wx_b = wx if x.ndim == 2 else wx[..., None]
    return cols0 * (1.0 - wx_b) + cols1 * wx_b


def shift_image(img: jax.Array, shift: jax.Array) -> jax.Array:
    """scipy.ndimage.shift(order=1, mode='reflect') parity.

    ``shift`` is ``(dy, dx)`` or ``(dy, dx, 0)`` (the reference extends
    the 2-vector with a zero channel shift at process-images.py:554-556;
    a zero channel shift is an identity, so both forms route here).
    Returns float32.
    """
    return bilinear_shift_2d(img, shift[0], shift[1])

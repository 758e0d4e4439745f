"""Exact histograms and percentiles on device.

The TPU-native key insight: the reference's white-balance percentiles
(``np.percentile(channel, (2, 98))`` at process-images.py:437) are order
statistics of a **uint8** channel, which takes at most 256 distinct
values. A 256-bin integer histogram therefore determines every order
statistic *exactly*, and histograms reduce across tiles/devices with a
single ``psum`` — so global percentiles over a sharded gigapixel mosaic
are exact, not approximate (SURVEY.md section 7 "hard parts").

NumPy percentile parity (verified empirically against numpy 2.0): for a
float32 input array ``np.percentile`` computes the virtual index
``vi = q/100 * (n-1)`` and then casts it to the *input dtype* (float32),
so ``k = floor(f32(vi))`` and ``gamma = f32(vi) - k`` carry float32
rounding; the lerp between order statistics ``a[k]`` and ``a[k+1]``
switches to the ``b - (b-a)*(1-t)`` form when ``t >= 0.5`` (numpy's
``_lerp``). The reference calls percentile on float32 channels
(process-images.py:431,437), so we replicate exactly that — bit-exact.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

NUM_LEVELS = 256


def channel_histograms(
    img: jax.Array,
    mask: Optional[jax.Array] = None,
    num_levels: int = NUM_LEVELS,
) -> jax.Array:
    """Per-channel histogram of a uint8 image.

    Args:
      img: ``(..., H, W, C)`` uint8 (or integer-valued) image.
      mask: optional ``(..., H, W)`` bool/0-1 validity mask (padding
        exclusion for tiled mosaics).
      num_levels: number of integer levels (256 for uint8).

    Returns:
      ``(..., C, num_levels)`` int32 counts.

    Implemented as a broadcast-compare + reduction (no scatter): XLA
    fuses the ``value == level`` compare into the reduce, so the image
    is read once per level-block and nothing of size ``N * 256`` is
    materialized. The Pallas fused kernel (rgnir_tpu.kernels) provides
    the single-read version for the hot path.
    """
    if img.ndim < 3:
        raise ValueError(f"expected (..., H, W, C), got shape {img.shape}")
    v = img.astype(jnp.int32)
    levels = jnp.arange(num_levels, dtype=jnp.int32)
    # (..., H, W, C, L) virtual compare, reduced over H, W.
    eq = (v[..., None] == levels).astype(jnp.int32)
    if mask is not None:
        eq = eq * mask.astype(jnp.int32)[..., None, None]
    hist = jnp.sum(eq, axis=(-4, -3))  # (..., C, L)
    return hist


def _lerp_numpy(a: jax.Array, b: jax.Array, t: float) -> jax.Array:
    """NumPy's _lerp: two-sided form for precision parity."""
    t = jnp.float32(t)
    diff = b - a
    lo_form = a + diff * t
    hi_form = b - diff * (1.0 - t)
    return jnp.where(t >= 0.5, hi_form, lo_form)


def percentiles_from_histogram(
    hist: jax.Array,
    qs: Sequence[float],
    n: Optional[int] = None,
) -> jax.Array:
    """Exact linear-interpolated percentiles from an integer histogram.

    Args:
      hist: ``(..., L)`` int32 counts over integer levels ``0..L-1``.
      qs: percentiles in [0, 100]. Must be static Python floats: the
        virtual index ``q/100 * (n-1)`` is computed at trace time in
        float64 (on-device float32 would corrupt the fractional part
        for large n).
      n: static total count. If ``None``, taken from ``sum(hist)`` —
        only valid when there is no masking and the count is uniform
        across leading dims; pass it explicitly for masked/dynamic
        cases... it must still be a Python int.

    Returns:
      ``(..., len(qs))`` float32 percentile values (level units).
    """
    cdf = jnp.cumsum(hist.astype(jnp.int32), axis=-1)  # (..., L)
    outs = []
    for q in qs:
        if n is None:
            raise ValueError("n (static total count) is required")
        if n <= 0:
            raise ValueError("n must be positive")
        # numpy computes vi in float64 then casts to the input dtype
        # (float32 for the reference's channels) before splitting into
        # floor + fractional parts — replicate its rounding exactly.
        vi = np.float32((q / 100.0) * (n - 1))
        k = int(np.floor(vi))
        d = float(np.float32(vi) - np.float32(k))
        k1 = min(k + 1, n - 1)
        # a[k] = count of levels whose cdf <= k  (0-indexed order stat)
        a_k = jnp.sum((cdf <= k).astype(jnp.int32), axis=-1).astype(jnp.float32)
        if d == 0.0:
            outs.append(a_k)
        else:
            a_k1 = jnp.sum((cdf <= k1).astype(jnp.int32), axis=-1).astype(
                jnp.float32
            )
            outs.append(_lerp_numpy(a_k, a_k1, d))
    return jnp.stack(outs, axis=-1)


def order_statistic_from_histogram(hist: jax.Array, rank: jax.Array) -> jax.Array:
    """Value of the ``rank``-th (0-indexed) order statistic from a histogram.

    ``rank`` may be traced (dynamic). Returns float32 level.
    """
    cdf = jnp.cumsum(hist.astype(jnp.int32), axis=-1)
    return jnp.sum((cdf <= rank).astype(jnp.int32), axis=-1).astype(jnp.float32)


def histogram_fixed_bins(
    values: jax.Array,
    bins: int,
    lo: float,
    hi: float,
    mask: Optional[jax.Array] = None,
    reduce_axes: Optional[Tuple[int, ...]] = None,
) -> jax.Array:
    """Exact ``np.histogram(values, bins, range=(lo, hi))`` parity for f32.

    For a float32 input array numpy materializes the uniform bin edges
    *in float32* (result_type of range and data under NEP 50) and its
    multiply-then-correct fast path is equivalent to an exact
    searchsorted against those f32 edges. We reproduce that as
    ``bin = #(interior/final f32 edges <= v)`` — a 51-way broadcast
    compare XLA fuses into the reduction (no gather, no scatter). Last
    bin is right-closed; out-of-range values drop. Used for the 50-bin
    index histogram (process-ndvi.py:96-102).
    """
    v = values.astype(jnp.float32)
    edges = jnp.asarray(np.linspace(lo, hi, bins + 1).astype(np.float32))
    vx = v[..., None]
    ge = vx >= edges  # v >= edge, exact f32 compare
    in_range = ge[..., 0] & (v <= edges[-1])
    if mask is not None:
        in_range = in_range & mask.astype(bool)
    idx = jnp.sum(ge[..., 1:].astype(jnp.int32), axis=-1)
    idx = jnp.minimum(idx, bins - 1)  # right-closed last bin

    levels = jnp.arange(bins, dtype=jnp.int32)
    eq = ((idx[..., None] == levels) & in_range[..., None]).astype(jnp.int32)
    if reduce_axes is None:
        reduce_axes = tuple(range(v.ndim))
    # reduce_axes refer to axes of `values`; normalize before the bins
    # axis appended above shifts negative indices.
    axes = tuple(a % v.ndim for a in reduce_axes)
    return jnp.sum(eq, axis=axes)

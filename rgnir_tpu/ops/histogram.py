"""Exact histograms and percentiles on device.

The TPU-native key insight: the reference's white-balance percentiles
(``np.percentile(channel, (2, 98))`` at process-images.py:437) are order
statistics of a **uint8** channel, which takes at most 256 distinct
values. A 256-bin integer histogram therefore determines every order
statistic *exactly*, and histograms reduce across tiles/devices with a
single ``psum`` — so global percentiles over a sharded gigapixel mosaic
are exact, not approximate (SURVEY.md section 7 "hard parts").

NumPy percentile parity (verified empirically against numpy 2.0):
``np.percentile`` has TWO precision behaviors. With a *scalar* q it
casts the virtual index ``vi = q/100 * (n-1)`` to the input dtype, so a
float32 array gets a float32 gamma whose error GROWS with n (ulp(vi) is
0.125 at 16 MPix — numpy's own precision quirk). With an *array/tuple*
q (what the reference uses: ``np.percentile(channel, (2, 98))`` at
process-images.py:437) everything stays float64 and the result is
float64. We implement the array-q model: the virtual index, floor and
gamma are computed at trace time in Python float64 (exact,
n-independent), and only the final lerp between the integer order
statistics runs on device in float32 — within 1 ulp of the reference's
float64 percentile, with numpy ``_lerp``'s two-sided form replicated.
The order statistics themselves are exact (integer histogram).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

NUM_LEVELS = 256

# f32 accumulates integer counts exactly below 2^24; chunk above that.
_EXACT_F32_CHUNK = 1 << 23


def nibble_product_histogram(
    values: jax.Array,
    weight: Optional[jax.Array] = None,
) -> jax.Array:
    """256-bin histogram of integer values in [0, 256) over the last axis.

    The TPU trick: a 256-wide one-hot factorizes over nibbles —
    ``onehot256(v) = onehot16(v >> 4) (x) onehot16(v & 15)`` — so the
    histogram is a tiny tensor contraction
    ``hist[hi, lo] = sum_n ohhi[n, hi] * ohlo[n, lo]``
    that runs on the MXU: 32 VPU compares per element instead of 256,
    and the 16x16 contraction is effectively free. bf16 one-hots with
    float32 accumulation are exact for chunk sizes < 2^24 (ensured by
    chunking), summed in int32 across chunks.

    Args:
      values: ``(..., N)`` integer array (int32 range [0, 256)).
      weight: optional ``(..., N)`` 0/1 weights (mask / radix-activity),
        folded into the hi one-hot at no extra cost.

    Returns:
      ``(..., 256)`` int32 counts.
    """
    v = values.astype(jnp.int32)
    n = v.shape[-1]
    nibble = jnp.arange(16, dtype=jnp.int32)

    def one_chunk(vc: jax.Array, wc: Optional[jax.Array]) -> jax.Array:
        oh_hi = ((vc >> 4)[..., None] == nibble).astype(jnp.bfloat16)
        oh_lo = ((vc & 15)[..., None] == nibble).astype(jnp.bfloat16)
        if wc is not None:
            oh_hi = oh_hi * wc[..., None].astype(jnp.bfloat16)
        h2 = jnp.einsum(
            "...ni,...nj->...ij", oh_hi, oh_lo,
            preferred_element_type=jnp.float32,
        )
        return h2.astype(jnp.int32).reshape(h2.shape[:-2] + (256,))

    if n <= _EXACT_F32_CHUNK:
        return one_chunk(v, weight)
    total = None
    for start in range(0, n, _EXACT_F32_CHUNK):
        sl = slice(start, min(start + _EXACT_F32_CHUNK, n))
        part = one_chunk(v[..., sl], None if weight is None else weight[..., sl])
        total = part if total is None else total + part
    return total


def planar_histograms(
    img_pl: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-channel histograms of a planar ``(..., C, H, W)`` uint8 image.

    Planar (band-major) layout is the TPU-native canonical form: W sits
    in the 128-wide lane dimension, so compares/one-hots run at full
    vector width, and channels batch the MXU contraction with no
    transpose. Returns ``(..., C, 256)`` int32.
    """
    c, h, w = img_pl.shape[-3], img_pl.shape[-2], img_pl.shape[-1]
    batch = img_pl.shape[:-3]
    v = img_pl.astype(jnp.int32).reshape(batch + (c, h * w))
    weight = None
    if mask is not None:
        m = mask.reshape(batch + (1, h * w)).astype(jnp.int32)
        weight = jnp.broadcast_to(m, v.shape)
    return nibble_product_histogram(v, weight)


def channel_histograms(
    img: jax.Array,
    mask: Optional[jax.Array] = None,
    num_levels: int = NUM_LEVELS,
) -> jax.Array:
    """Per-channel histogram of an interleaved ``(..., H, W, C)`` uint8
    image — the reference's layout. Internally converts to planar once
    (uint8 relayout) and uses :func:`planar_histograms`.

    Returns ``(..., C, num_levels)`` int32 counts.
    """
    if img.ndim < 3:
        raise ValueError(f"expected (..., H, W, C), got shape {img.shape}")
    if num_levels != NUM_LEVELS:
        raise ValueError("only 256-level histograms are supported")
    return planar_histograms(jnp.moveaxis(img, -1, -3), mask)


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
      n: static total count — REQUIRED, and must be a Python int. It
        cannot be derived from ``sum(hist)`` here because the virtual
        index must be computed at trace time in float64, and ``hist``
        is a traced array.

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
        # Array-q numpy model: float64 virtual index, exact at trace time.
        vi = (float(q) / 100.0) * (n - 1)
        k = int(np.floor(vi))
        d = vi - k
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
    if bins > 256:
        raise ValueError("bins must be <= 256")
    v = values.astype(jnp.float32)
    edges = np.linspace(lo, hi, bins + 1).astype(np.float32)

    if _certify_affine_binning(edges, np.float32(lo), bins):
        # Cheap path: one fused multiply + floor per pixel; certified at
        # trace time to agree with exact edge-searchsorted for every f32
        # input (both maps are monotone step functions of v, so checking
        # each edge and its predecessor f32 value suffices).
        scale = np.float32(bins / (np.float64(hi) - np.float64(lo)))
        idx = jnp.floor((v - np.float32(lo)) * scale).astype(jnp.int32)
        idx = jnp.clip(idx, 0, bins - 1)
    else:  # pragma: no cover - exercised only for adversarial ranges
        vx = v[..., None]
        ge = vx >= jnp.asarray(edges)
        idx = jnp.sum(ge[..., 1:].astype(jnp.int32), axis=-1)
        idx = jnp.minimum(idx, bins - 1)
    in_range = (v >= edges[0]) & (v <= edges[-1])
    if mask is not None:
        in_range = in_range & mask.astype(bool)

    if reduce_axes is None:
        reduce_axes = tuple(range(v.ndim))
    axes = tuple(a % v.ndim for a in reduce_axes)
    # Move non-reduced axes forward, flatten the reduction domain, and
    # histogram on the MXU via the nibble tensor product.
    keep = tuple(a for a in range(v.ndim) if a not in axes)
    perm = keep + axes
    idx_t = jnp.transpose(idx, perm).reshape(
        tuple(v.shape[a] for a in keep) + (-1,)
    )
    w_t = jnp.transpose(in_range, perm).reshape(idx_t.shape)
    return nibble_product_histogram(idx_t, w_t.astype(jnp.int32))[..., :bins]


@functools.lru_cache(maxsize=64)
def _certify_affine_binning_cached(edges_bytes: bytes, lo: float, bins: int) -> bool:
    edges = np.frombuffer(edges_bytes, dtype=np.float32)
    lo32 = np.float32(lo)
    scale = np.float32(
        bins / (np.float64(edges[-1]) - np.float64(edges[0]))
    )

    def affine_bin(x: np.ndarray) -> np.ndarray:
        return np.floor((x - lo32) * scale).astype(np.int64)

    for i in range(1, bins + 1):
        e = edges[i]
        if affine_bin(np.float32(e)) != i:
            return False
        below = np.nextafter(e, -np.inf, dtype=np.float32)
        if below >= edges[0] and affine_bin(below) != i - 1:
            return False
    return True


def _certify_affine_binning(edges: np.ndarray, lo: np.float32, bins: int) -> bool:
    """True iff floor((v - lo) * scale) reproduces exact f32-edge
    searchsorted for every float32 v in range (checked at each edge and
    the f32 value just below it; monotonicity extends the guarantee)."""
    return _certify_affine_binning_cached(edges.tobytes(), float(lo), bins)

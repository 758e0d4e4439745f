"""Percentile-stretch white balance (reference: process-images.py:424-447).

Reference semantics, per channel i of an RGNir image:

    p2, p98 = np.percentile(channel_f32, (2, 98))
    corrected[:,:,i] = np.clip((channel - p2) / (p98 - p2) * 255, 0, 255)
    result = corrected.astype(np.uint8)     # truncation

(Identical math in backend-process.py:17-26; process-rgn.py:25-38 clips
to [p2, p98] *before* rescale, which is numerically the same.)

TPU-native design: percentiles come from an exact 256-bin histogram
(see rgnir_tpu.ops.histogram) — one reduction pass — and the rescale is
a fused elementwise op. For sharded mosaics the histogram is psum'd so
the stretch is *globally* consistent across tiles, which the reference
(one image at a time) could never do.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rgnir_tpu.config import WBConfig
from rgnir_tpu.ops.histogram import channel_histograms, percentiles_from_histogram


def wb_bounds_from_histogram(
    hist: jax.Array,
    n: int,
    cfg: WBConfig = WBConfig(),
) -> Tuple[jax.Array, jax.Array]:
    """Per-channel (p_low, p_high) stretch bounds from a (..., C, 256) histogram."""
    ps = percentiles_from_histogram(hist, (cfg.p_low, cfg.p_high), n=n)
    return ps[..., 0], ps[..., 1]  # (..., C) each


def apply_white_balance_planar(
    img_pl: jax.Array,
    lo: jax.Array,
    hi: jax.Array,
    cfg: WBConfig = WBConfig(),
) -> jax.Array:
    """Rescale a planar ``(..., C, H, W)`` image by per-channel bounds.

    ``lo``/``hi`` broadcast as ``(..., C)``. Degenerate channels
    (hi <= lo) pass through as 0 (the reference divides by zero there;
    we define the guard instead of emitting NaN). Reference op ordering
    preserved (process-images.py:438):
    ``(channel - p2) / (p98 - p2) * 255``. Precision: the reference's
    tuple-q percentiles are float64 and promote its rescale to float64;
    this runs in float32, flipping the uint8 floor by +/-1 on <0.2%% of
    pixels (tests/golden.py, PARITY.md).
    """
    x = img_pl.astype(jnp.float32)
    lo = lo[..., :, None, None].astype(jnp.float32)
    hi = hi[..., :, None, None].astype(jnp.float32)
    span = hi - lo
    corrected = (x - lo) / span * cfg.out_scale
    corrected = jnp.where(span > 0, corrected, 0.0)
    return jnp.clip(corrected, 0.0, cfg.out_scale).astype(jnp.uint8)


def apply_white_balance(
    img: jax.Array,
    lo: jax.Array,
    hi: jax.Array,
    cfg: WBConfig = WBConfig(),
) -> jax.Array:
    """Interleaved ``(..., H, W, C)`` variant of
    :func:`apply_white_balance_planar` (the reference's layout)."""
    pl = apply_white_balance_planar(jnp.moveaxis(img, -1, -3), lo, hi, cfg)
    return jnp.moveaxis(pl, -3, -1)


@functools.partial(jax.jit, static_argnames=("n_valid",))
def gray_world_balance(
    img: jax.Array,
    mask: Optional[jax.Array] = None,
    n_valid: Optional[int] = None,
) -> jax.Array:
    """Gray-world white balance: scale each channel so its mean matches
    the cross-channel mean (the classic illuminant-estimation
    alternative to the reference's percentile stretch — named alongside
    it in the project north star). Pure reductions + one elementwise
    pass; XLA fuses it, no kernel needed.

    Args:
      img: ``(..., H, W, C)`` uint8.
      mask/n_valid: optional padding exclusion (n_valid static).

    Returns:
      uint8 image with equalized channel means.
    """
    x = img.astype(jnp.float32)
    if mask is not None:
        if n_valid is None:
            raise ValueError("n_valid (static) required with mask")
        mf = mask.astype(jnp.float32)[..., None]
        means = jnp.sum(x * mf, axis=(-3, -2)) / n_valid  # (..., C)
    else:
        means = jnp.mean(x, axis=(-3, -2))
    gray = jnp.mean(means, axis=-1, keepdims=True)
    scale = jnp.where(means > 0, gray / means, 1.0)
    out = jnp.clip(x * scale[..., None, None, :], 0.0, 255.0)
    return out.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("cfg", "n_valid"))
def white_balance(
    img: jax.Array,
    cfg: WBConfig = WBConfig(),
    mask: Optional[jax.Array] = None,
    n_valid: Optional[int] = None,
) -> jax.Array:
    """Full white balance: histogram -> exact percentiles -> rescale.

    Args:
      img: ``(..., H, W, C)`` uint8 RGNir image(s). Leading dims are
        batched (each image gets its own per-channel percentiles, as in
        the reference's per-image loop).
      mask: optional validity mask ``(..., H, W)`` for padded inputs.
      n_valid: static valid-pixel count (required with ``mask``).

    Returns:
      uint8 corrected image, same shape.
    """
    h, w = img.shape[-3], img.shape[-2]
    n = n_valid if mask is not None else h * w
    if mask is not None and n_valid is None:
        raise ValueError("n_valid (static) is required when mask is given")
    if img.dtype == jnp.uint8:
        hist = channel_histograms(img, mask=mask)
        lo, hi = wb_bounds_from_histogram(hist, n=n, cfg=cfg)
    else:
        # General float inputs (beyond the reference's uint8 images):
        # exact percentiles by radix-select instead of the 256-level
        # histogram.
        from rgnir_tpu.ops.select import exact_quantiles

        pl = jnp.moveaxis(img, -1, -3)  # (..., C, H, W)
        cmask = None
        if mask is not None:
            cmask = jnp.broadcast_to(mask[..., None, :, :], pl.shape)
        qs = exact_quantiles(
            pl, (cfg.p_low, cfg.p_high), n_valid=n, mask=cmask, reduce_ndim=2
        )  # (..., C, 2)
        lo, hi = qs[..., 0], qs[..., 1]
    return apply_white_balance(img, lo, hi, cfg=cfg)

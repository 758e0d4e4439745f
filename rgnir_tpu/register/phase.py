"""Phase-correlation shift estimation (reference: process-images.py:515-565).

The reference calls skimage ``phase_cross_correlation(fixed_gray,
moving_gray)`` (process-images.py:550) with default parameters:
normalized (phase) cross-power spectrum, integer-pixel shift from the
argmax of the inverse FFT, unwrapped to signed shifts around the
midpoint. Rebuilt here on ``jnp.fft`` so estimation runs on device and
batches/vmaps; an optional local 3-point parabolic refinement provides
subpixel shifts (the reference never requests subpixel).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from rgnir_tpu.register.warp import bilinear_shift_2d

# skimage rgb2gray coefficients (ITU-R BT.709 luma used by skimage).
_RGB2GRAY = (0.2125, 0.7154, 0.0721)


def luminance(img: jax.Array) -> jax.Array:
    """skimage ``rgb2gray`` parity: uint8 -> [0,1] float, BT.709 weights.

    (For RGNir content the 'gray' is spectrally arbitrary, but alignment
    only needs a consistent scalar projection — we keep reference
    behavior. process-images.py:538-547.)
    """
    if img.ndim == 2:
        x = img.astype(jnp.float32)
        if img.dtype == jnp.uint8:
            x = x / 255.0
        return x
    x = img.astype(jnp.float32)
    if img.dtype == jnp.uint8:
        x = x / 255.0
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    return _RGB2GRAY[0] * r + _RGB2GRAY[1] * g + _RGB2GRAY[2] * b


def _parabolic_refine(c_m: jax.Array, c_0: jax.Array, c_p: jax.Array) -> jax.Array:
    """Subpixel offset in [-0.5, 0.5] from 3 correlation samples."""
    denom = c_m - 2.0 * c_0 + c_p
    off = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (c_m - c_p) / denom, 0.0)
    return jnp.clip(off, -0.5, 0.5)


def _upsampled_dft(
    prod: jax.Array,
    region: int,
    upsample: int,
    off_y: jax.Array,
    off_x: jax.Array,
) -> jax.Array:
    """Matrix-multiply DFT of the cross-power spectrum on an upsampled
    ``region x region`` grid starting at (off_y, off_x) in upsampled
    coordinates (Guizar-Sicairos local refinement; the technique behind
    skimage's ``upsample_factor``). Runs on the MXU: two complex
    matmuls of shape (region, H) @ (H, W) @ (W, region)."""
    h, w = prod.shape
    fy = jnp.fft.fftfreq(h).astype(jnp.float32)  # cycles/sample
    fx = jnp.fft.fftfreq(w).astype(jnp.float32)
    r = jnp.arange(region, dtype=jnp.float32)
    # sample positions in original-pixel units
    pos_y = (off_y + r) / upsample  # (region,)
    pos_x = (off_x + r) / upsample
    ky = jnp.exp(
        (2j * jnp.pi) * pos_y[:, None] * fy[None, :]
    )  # (region, H): inverse-DFT kernel rows
    kx = jnp.exp((2j * jnp.pi) * fx[:, None] * pos_x[None, :])  # (W, region)
    return ky @ prod @ kx  # (region, region) complex


@functools.partial(
    jax.jit, static_argnames=("subpixel", "upsample_factor")
)
def phase_correlation_shift(
    fixed: jax.Array,
    moving: jax.Array,
    subpixel: bool = False,
    upsample_factor: int = 1,
) -> jax.Array:
    """Estimated (dy, dx) such that shifting ``moving`` by it aligns it
    to ``fixed`` — skimage sign convention: ``shift = argmax`` of
    ``ifft2(F_fixed * conj(F_moving) / |.|)``, unwrapped to signed.

    Args:
      fixed/moving: ``(H, W)`` float grayscale (see :func:`luminance`).
      subpixel: add 3-point parabolic refinement per axis (cheap).
      upsample_factor: > 1 refines the shift to 1/upsample_factor pixel
        via a local matrix-multiply DFT around the coarse peak (the
        skimage ``upsample_factor`` capability; overrides ``subpixel``).

    Returns:
      ``(2,)`` float32 ``(dy, dx)``.
    """
    h, w = fixed.shape
    f = jnp.fft.rfft2(fixed.astype(jnp.float32))
    m = jnp.fft.rfft2(moving.astype(jnp.float32))
    prod = f * jnp.conj(m)
    mag = jnp.abs(prod)
    prod = prod / jnp.maximum(mag, 1e-20)  # phase normalization
    cc = jnp.fft.irfft2(prod, s=(h, w))
    cabs = jnp.abs(cc)

    flat_idx = jnp.argmax(cabs)
    py = (flat_idx // w).astype(jnp.int32)
    px = (flat_idx % w).astype(jnp.int32)

    # Unwrap: peaks beyond the midpoint are negative shifts
    # (skimage: shifts[shifts > midpoint] -= shape).
    dy = jnp.where(py > h // 2, py - h, py).astype(jnp.float32)
    dx = jnp.where(px > w // 2, px - w, px).astype(jnp.float32)

    if upsample_factor > 1:
        # Full-spectrum cross-power (normalized) for the matrix DFT.
        ff = jnp.fft.fft2(fixed.astype(jnp.float32))
        fm = jnp.fft.fft2(moving.astype(jnp.float32))
        p = ff * jnp.conj(fm)
        p = p / jnp.maximum(jnp.abs(p), 1e-20)
        region = int(np.ceil(1.5 * upsample_factor))
        # window centered on the coarse estimate, in upsampled coords
        off_y = dy * upsample_factor - (region - 1) / 2.0
        off_x = dx * upsample_factor - (region - 1) / 2.0
        cc_up = jnp.abs(_upsampled_dft(p, region, upsample_factor,
                                       off_y, off_x))
        up_idx = jnp.argmax(cc_up)
        uy = (up_idx // region).astype(jnp.float32)
        ux = (up_idx % region).astype(jnp.float32)
        dy = (off_y + uy) / upsample_factor
        dx = (off_x + ux) / upsample_factor
    elif subpixel:
        ym = cabs[(py - 1) % h, px]
        yp = cabs[(py + 1) % h, px]
        xm = cabs[py, (px - 1) % w]
        xp = cabs[py, (px + 1) % w]
        c0 = cabs[py, px]
        dy = dy + _parabolic_refine(ym, c0, yp)
        dx = dx + _parabolic_refine(xm, c0, xp)
    return jnp.stack([dy, dx])


@functools.partial(jax.jit, static_argnames=("subpixel", "upsample_factor"))
def align_images(
    fixed: jax.Array,
    moving: jax.Array,
    subpixel: bool = False,
    upsample_factor: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """``align_images`` parity (process-images.py:515-565), fully on device.

    Grayscale both, estimate the shift by phase correlation (optionally
    to 1/upsample_factor pixel), resample ``moving`` with bilinear +
    reflect (scipy order=1/mode='reflect' parity). Returns
    ``(aligned_float32, shift)``; the reference's pre-alignment <=1024
    downscale lives in the calling pipeline (rgnir_tpu.pipeline.change),
    not here — ops keep static shapes.
    """
    fg = luminance(fixed)
    mg = luminance(moving)
    shift = phase_correlation_shift(
        fg, mg, subpixel=subpixel, upsample_factor=upsample_factor
    )
    aligned = bilinear_shift_2d(moving, shift[0], shift[1])
    return aligned, shift

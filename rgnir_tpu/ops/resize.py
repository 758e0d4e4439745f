"""Separable resampling as matrix multiplies — MXU-native resize.

The reference downscales with PIL LANCZOS at four places (SURVEY.md
section 2.6): store cap 2048 (process-images.py:231-243), analysis cap
1024 (process-images.py:398-422), alignment cap 1024
(process-images.py:530-536), thumbnails 400x400 (process-images.py:188).

TPU-native design: a separable resampler is two dense matmuls
(``out = R_h @ img @ R_w^T``), which XLA maps straight onto the MXU —
no gather, no dynamic shapes. The resample matrices are built on the
host at trace time with PIL's geometry (center-aligned sampling,
support scaled by the downscale factor, per-row weight normalization)
and baked into the jit as constants.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _lanczos(x: np.ndarray, a: int = 3) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    out = np.sinc(x) * np.sinc(x / a)
    out[np.abs(x) >= a] = 0.0
    return out


def _bilinear(x: np.ndarray) -> np.ndarray:
    x = np.abs(np.asarray(x, dtype=np.float64))
    return np.maximum(0.0, 1.0 - x)


_FILTERS = {
    "lanczos3": (_lanczos, 3.0),
    "bilinear": (_bilinear, 1.0),
}


@functools.lru_cache(maxsize=256)
def resize_matrix(n_in: int, n_out: int, method: str = "lanczos3") -> np.ndarray:
    """(n_out, n_in) resampling matrix with PIL-style geometry."""
    kernel, support = _FILTERS[method]
    scale = n_in / n_out
    filterscale = max(scale, 1.0)  # widen support when downscaling
    supp = support * filterscale
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    for i in range(n_out):
        center = (i + 0.5) * scale
        lo = max(int(math.floor(center - supp)), 0)
        hi = min(int(math.ceil(center + supp)), n_in)
        xs = np.arange(lo, hi)
        w = kernel((xs + 0.5 - center) / filterscale)
        s = w.sum()
        if s != 0:
            w = w / s
        mat[i, lo:hi] = w
    return mat.astype(np.float32)


def _round_u8(x: jax.Array) -> jax.Array:
    """PIL fixed-point rounding: floor(x + 0.5), clipped to [0, 255]."""
    return jnp.clip(jnp.floor(x + 0.5), 0, 255)


@functools.partial(jax.jit, static_argnames=("out_hw", "method", "as_uint8"))
def resize(
    img: jax.Array,
    out_hw: Tuple[int, int],
    method: str = "lanczos3",
    as_uint8: bool = False,
) -> jax.Array:
    """Resize ``(..., H, W)`` or ``(..., H, W, C)`` to ``out_hw``.

    Channel dim is detected as a trailing dim of size <= 4. With
    ``as_uint8`` the PIL pipeline is emulated: horizontal pass first,
    the intermediate quantized to uint8 (PIL's ImagingResampleHorizontal
    emits a uint8 image), then the vertical pass, both rounding
    floor(x+0.5) — +/-1 parity with PIL LANCZOS in tests. Float output
    keeps full precision in a single fused pair of matmuls.
    """
    has_c = img.shape[-1] <= 4 and img.ndim >= 3
    h_ax = img.ndim - (3 if has_c else 2)
    w_ax = h_ax + 1
    h_in, w_in = img.shape[h_ax], img.shape[w_ax]
    mh = jnp.asarray(resize_matrix(h_in, out_hw[0], method))
    mw = jnp.asarray(resize_matrix(w_in, out_hw[1], method))
    x = img.astype(jnp.float32)
    if as_uint8:
        x = jnp.moveaxis(jnp.tensordot(mw, x, axes=[[1], [w_ax]]), 0, w_ax)
        x = _round_u8(x)  # PIL's uint8 intermediate after the horizontal pass
        x = jnp.moveaxis(jnp.tensordot(mh, x, axes=[[1], [h_ax]]), 0, h_ax)
        return _round_u8(x).astype(jnp.uint8)
    x = jnp.moveaxis(jnp.tensordot(mh, x, axes=[[1], [h_ax]]), 0, h_ax)
    x = jnp.moveaxis(jnp.tensordot(mw, x, axes=[[1], [w_ax]]), 0, w_ax)
    return x


def analysis_dims(h: int, w: int, max_dimension: int) -> Tuple[int, int]:
    """preprocess_large_image new-dims formula (process-images.py:404-416):
    longest side to ``max_dimension``, other side ``int(...)``-truncated."""
    if max(h, w) <= max_dimension:
        return h, w
    if h > w:
        return max_dimension, int(w * (max_dimension / h))
    return int(h * (max_dimension / w)), max_dimension


def preprocess_large_image(
    img: jax.Array, max_dimension: int = 1024, method: str = "lanczos3"
) -> jax.Array:
    """Analysis-time downscale parity (process-images.py:398-422).

    No-op if the image is already within the cap; otherwise a LANCZOS
    resize keeping aspect (uint8 in, uint8 out).
    """
    h, w = img.shape[0], img.shape[1]
    nh, nw = analysis_dims(h, w, max_dimension)
    if (nh, nw) == (h, w):
        return img
    return resize(img, (nh, nw), method=method, as_uint8=img.dtype == jnp.uint8)

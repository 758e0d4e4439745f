"""The fused per-image analysis pass — the framework's flagship forward.

One jit-compiled trace performs what the reference does in four separate
full-image passes with host round-trips between each (SURVEY.md section
3.2 hot-loop note): white balance (process-images.py:424-447) -> index
maps (449-490) -> statistics (492-513) -> colormap render (669-716).
Under XLA these fuse so each pixel is read once per reduction tree and
the elementwise chain never materializes intermediates in HBM.

Batched over leading dims: an ``(B, H, W, 3)`` batch computes B
independent per-image percentiles/stats in the same pass (the
reference loops images one at a time in Python).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple, Union

import flax.struct
import jax
import jax.numpy as jnp

from rgnir_tpu.config import ALL_INDICES, IndexConfig, IndexKind, WBConfig
from rgnir_tpu.ops.colormap import render_colormap
from rgnir_tpu.ops.histogram import planar_histograms
from rgnir_tpu.ops.indices import band_indices, index_from_bands
from rgnir_tpu.ops.stats import IndexStats, index_stats
from rgnir_tpu.ops.wb import apply_white_balance_planar, wb_bounds_from_histogram


@flax.struct.dataclass
class AnalyzeResult:
    """Outputs of one fused analysis pass (dict keys are index names)."""

    wb: jax.Array                         # (..., H, W, 3) uint8 white-balanced
    indices: Dict[str, jax.Array]         # kind -> (..., H, W) f32 in [-1, 1]
    stats: Dict[str, IndexStats]          # kind -> IndexStats
    renders: Dict[str, jax.Array]         # kind -> (..., H, W, 3) uint8 (may be empty)


def analyze_image(
    img: jax.Array,
    kinds: Sequence[Union[IndexKind, str]] = ALL_INDICES,
    wb_cfg: WBConfig = WBConfig(),
    idx_cfg: IndexConfig = IndexConfig(),
    with_renders: bool = True,
    with_wb: bool = True,
    mask: Optional[jax.Array] = None,
    n_valid: Optional[int] = None,
    with_hist: bool = True,
) -> AnalyzeResult:
    """Fused WB -> indices -> stats -> colormap on ``(..., H, W, 3)`` uint8.

    ``kinds``/``with_renders`` are static. With ``with_wb=False`` the
    indices are computed on the raw image (the process-ndvi.py:5-48 path,
    which skips white balance).

    TPU-first layout: the interleaved HWC input is converted once to
    planar (band-major) ``(..., C, H, W)`` so W rides the 128-wide lane
    dimension for every subsequent op; outputs convert back to the
    reference's HWC at the boundary (cheap uint8 relayouts).
    """
    kinds = tuple(IndexKind.parse(k) for k in kinds)
    h, w = img.shape[-3], img.shape[-2]
    n = h * w if mask is None else n_valid
    if mask is not None and n_valid is None:
        raise ValueError("n_valid (static) required with mask")

    pl = jnp.moveaxis(img, -1, -3)  # (..., 3, H, W)
    if with_wb:
        hist = planar_histograms(pl, mask=mask)
        lo, hi = wb_bounds_from_histogram(hist, n=n, cfg=wb_cfg)
        base = apply_white_balance_planar(pl, lo, hi, cfg=wb_cfg)
    else:
        base = pl

    indices: Dict[str, jax.Array] = {}
    stats: Dict[str, IndexStats] = {}
    renders: Dict[str, jax.Array] = {}
    for kind in kinds:
        ia, ib = band_indices(kind)
        idx = index_from_bands(
            base[..., ia, :, :], base[..., ib, :, :], cfg=idx_cfg
        )
        indices[kind.value] = idx
        stats[kind.value] = index_stats(
            idx, kind, cfg=idx_cfg, mask=mask, n_valid=n_valid,
            with_hist=with_hist,
        )
        if with_renders:
            renders[kind.value] = render_colormap(idx, kind)
    return AnalyzeResult(
        wb=jnp.moveaxis(base, -3, -1), indices=indices, stats=stats,
        renders=renders,
    )


@functools.partial(
    jax.jit,
    static_argnames=("kinds", "with_renders", "with_wb", "with_hist"),
)
def analyze_image_jit(
    img: jax.Array,
    kinds: Tuple[str, ...] = tuple(k.value for k in ALL_INDICES),
    with_renders: bool = True,
    with_wb: bool = True,
    with_hist: bool = True,
) -> AnalyzeResult:
    """jit wrapper with default configs (the common entry point)."""
    return analyze_image(
        img, kinds=kinds, with_renders=with_renders, with_wb=with_wb,
        with_hist=with_hist,
    )

"""Fused per-channel 256-bin histogram kernel.

One HBM read of the uint8 image; nibble one-hots are built in VMEM and
contracted on the MXU ((N,16)^T @ (N,16) -> (16,16) per channel);
partial histograms accumulate in the output ref across row-block grid
steps. Padding rows/cols are masked in-kernel from static valid bounds
(no mask tensor traffic).

jnp reference: rgnir_tpu.ops.histogram.planar_histograms.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _ceil_to(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _hist_kernel(img_ref, out_ref, *, h_valid: int, w_valid: int, block_h: int):
    """Grid: (num_row_blocks,). img_ref: (C, block_h, Wp) uint8.
    out_ref: (C, 16, 16) float32 [hi, lo], accumulated across steps
    (flattened to (C, 256) by the wrapper — Mosaic cannot reshape
    (16,16) -> (1,256) in-kernel)."""
    step = pl.program_id(0)
    c, bh, wp = img_ref.shape

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    n = bh * wp
    row0 = step * block_h
    rows = jax.lax.broadcasted_iota(jnp.int32, (bh, wp), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (bh, wp), 1)
    # (1, n) row layout: Mosaic reshapes must keep the lane dim wide.
    mrow = ((rows < h_valid) & (cols < w_valid)).reshape(1, n)
    nib_col = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)

    for ch in range(c):
        vrow = img_ref[ch].astype(jnp.int32).reshape(1, n)
        # f32 one-hots: Mosaic cannot relayout i1 masks into the
        # (16,128) bf16 tiling, and 16-wide contractions do not need
        # bf16 MXU throughput anyway.
        oh_hi = jnp.where(
            mrow & ((vrow >> 4) == nib_col), jnp.float32(1), jnp.float32(0)
        )  # (16, n)
        oh_lo = jnp.where(
            (vrow & 15) == nib_col, jnp.float32(1), jnp.float32(0)
        )  # (16, n)
        h2 = jax.lax.dot_general(
            oh_hi, oh_lo,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (16, 16): hist[hi, lo]
        out_ref[ch] += h2


@functools.partial(jax.jit, static_argnames=("block_h", "interpret"))
def _hist_call(img_pl: jax.Array, block_h: int, interpret: bool) -> jax.Array:
    c, h, w = img_pl.shape
    wp = _ceil_to(w, 128)
    hp = _ceil_to(h, block_h)
    padded = jnp.pad(img_pl, ((0, 0), (0, hp - h), (0, wp - w)))
    grid = (hp // block_h,)
    out = pl.pallas_call(
        functools.partial(
            _hist_kernel, h_valid=h, w_valid=w, block_h=block_h
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (c, block_h, wp), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (c, 16, 16), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, 16, 16), jnp.float32),
        interpret=interpret,
    )(padded)
    return out.reshape(c, 256).astype(jnp.int32)


def planar_histograms_pallas(
    img_pl: jax.Array,
    block_h: int = 64,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Per-channel 256-bin histograms of a planar uint8 image.

    Accepts ``(C, H, W)`` or ``(B, C, H, W)`` (vmapped). Exact int32
    counts (f32 accumulation stays exact: per-(channel, bin) count is
    bounded by the image size; caller should chunk above 2^24 pixels).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if img_pl.ndim == 4:
        return jax.vmap(
            lambda x: _hist_call(x, block_h, interpret)
        )(img_pl)
    return _hist_call(img_pl, block_h, interpret)

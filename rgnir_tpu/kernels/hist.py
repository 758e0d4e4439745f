"""Fused per-channel 256-bin histogram kernel.

One HBM read of the uint8 image; nibble one-hots are built in VMEM and
contracted on the MXU ((16,n) @ (16,n)^T -> (16,16) per channel);
partial histograms accumulate in the output ref across grid steps.

Canonical kernel layout: pixels flattened row-major into (C, R, 1024)
— Mosaic reliably supports the (block_r, 1024) -> (1, n) in-kernel
reshape, while arbitrary-width reshapes crash its layout pass. The
wrapper flattens/pads in XLA (free for contiguous arrays) and masks
padding positionally (tail positions >= n_valid).

jnp reference: rgnir_tpu.ops.histogram.planar_histograms.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 1024


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _ceil_to(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _hist_kernel(img_ref, nvalid_ref, out_ref, *, spf: Optional[int] = None,
                 skip_mask: bool = False):
    """Grid: (num_blocks,). img_ref: (C, block_r, 1024) uint8 flat rows.
    nvalid_ref: (1,) int32 SMEM — valid-pixel count (may be traced, e.g.
    a shard's dynamic row count). out_ref: (C, 16, 16) f32 [hi, lo].

    ``spf`` (static, batched layout): steps per frame. Frames are
    stacked along the row dimension (one flat grid — no vmap batch grid
    dim, which measured 2.6x slower per pixel on real Mosaic); the
    frame-local step ``step % spf`` drives the positional mask and the
    accumulator init, and the out BlockSpec maps step -> frame so each
    frame's histogram lands in its own (C, 16, 16) block.

    ``skip_mask`` (static): the caller proved n_valid covers everything
    and any tail padding is ZERO bytes — pads then count into bin 0,
    which the wrapper subtracts (exact integer correction), so the
    positional mask is elided at ANY shape, not just block-aligned
    ones."""
    step = pl.program_id(0)
    fs = step if spf is None else jax.lax.rem(step, spf)
    c, br, wc = img_ref.shape
    n = br * wc

    @pl.when(fs == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    if skip_mask:
        valid = None
    else:
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (br, wc), 0) * wc
            + jax.lax.broadcasted_iota(jnp.int32, (br, wc), 1)
            + fs * n
        )
        valid = pos < nvalid_ref[0]
    nib_col = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)

    for ch in range(c):
        v = img_ref[ch].astype(jnp.int32)
        # Fold the validity mask into the VALUE: invalid pixels become
        # 256, whose high nibble (16) matches no one-hot row, so they
        # contribute zero to every bin. One select on (br, wc) replaces
        # an AND across the 16 one-hot rows — measured 5-7x faster for
        # this kernel (benchmarks/exp_hist.py).
        if valid is not None:
            v = jnp.where(valid, v, 256)
        vrow = v.reshape(1, n)
        # f32 one-hots: Mosaic cannot relayout i1 masks into the
        # (16,128) bf16 tiling, and 16-wide contractions do not need
        # bf16 MXU throughput anyway.
        oh_hi = jnp.where(
            (vrow >> 4) == nib_col, jnp.float32(1), jnp.float32(0)
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


def auto_block_r(
    n_pixels: int,
    target_steps: int = 64,
    cap: int = 64,
    kernel: Optional[str] = None,
) -> int:
    """Pick a block row count balancing VMEM footprint (one-hot and
    ge-matrix intermediates scale with block_r*1024) against grid-step
    count (small images want small blocks; mosaics want large ones).
    ``cap`` is per-kernel: the fused kernel's working set is ~3x the
    histogram kernel's, so it passes a lower cap to stay inside the
    16 MB VMEM scoped limit.

    With ``kernel`` given, a measured winner from the autotune cache
    (rgnir_tpu.utils.autotune — populated by ``rgnir-tpu tune``)
    overrides the heuristic INCLUDING the cap: the tuner only stores
    candidates that compiled and won on this device, and it tunes the
    fused kernel at its worst-case (3-kind) VMEM footprint.

    Either choice then yields to a DIVIDING block when one exists: if
    the pixel count is lane-exact (n % 1024 == 0) and some multiple of
    8 at or under the cap divides the row count, the kernels' static
    no-padding proof holds and every positional mask is elided — which
    measured 3.2x over the bucket-tuned-but-masked block on a 16.6-MPix
    stats pass (8640x1920: tuned b24 winner 16 leaves a padded tail,
    dividing 24 elides; 2026-08-18 interleaved A/B, and even the small
    dividing 8 beat every masked choice). Alignment beats bucket
    tuning, so the tuner's winner applies as-is only when it already
    divides."""
    rows = _cdiv(n_pixels, _LANES)

    def prefer_dividing(candidate: int) -> int:
        if n_pixels % _LANES != 0 or rows % candidate == 0:
            return candidate  # no elision possible / already dividing
        # tuned winners may exceed the cap (they compiled and won) —
        # search divisors up to whichever is larger
        top = min(max(cap, candidate), rows)
        for b in range(top - top % 8, 7, -8):
            if rows % b == 0:
                return b
        return candidate

    if kernel is not None:
        from rgnir_tpu.utils.autotune import lookup_block_r

        hit = lookup_block_r(kernel, n_pixels)
        if hit is not None:
            return prefer_dividing(max(8, _ceil_to(hit, 8)))
    # Floor 32: the 512^2-class images measured ~2x faster at 32 rows
    # per step than 16 (fewer grid steps; benchmarks/exp_hist.py).
    ideal = max(32, rows // target_steps)
    return prefer_dividing(min(cap, _ceil_to(ideal, 8)))


def flatten_to_rows(x: jax.Array, block_r: int, fill: int = 0):
    """(..., H, W) -> (..., R, 1024) row-major flat with tail padding.

    Raises for images whose padded pixel count exceeds int32 range: the
    kernels' positional padding masks (``iota*wc + iota + step*n``) are
    int32 (Mosaic has no i64 vectors), so beyond 2^31-1 pixels the mask
    would silently wrap and corrupt the stats. Oversize mosaics belong
    on the sharded path (rgnir_tpu.parallel.analyze_mosaic), where each
    shard's positions are shard-local.
    """
    *lead, h, w = x.shape
    n = h * w
    rows = _ceil_to(_cdiv(n, _LANES), block_r)
    if rows * _LANES > 2**31 - 1:
        raise ValueError(
            f"image has {n} pixels ({rows * _LANES} padded) — beyond the "
            "int32 positional-mask range of the single-pass kernels "
            "(2^31-1). Shard it across devices with "
            "rgnir_tpu.parallel.analyze_mosaic instead."
        )
    pad = rows * _LANES - n
    flat = x.reshape(tuple(lead) + (n,))
    if pad:
        widths = [(0, 0)] * len(lead) + [(0, pad)]
        flat = jnp.pad(flat, widths, constant_values=fill)
    return flat.reshape(tuple(lead) + (rows, _LANES))


@functools.partial(jax.jit, static_argnames=("block_r", "interpret"))
def _hist_call(
    img_pl: jax.Array,
    block_r,
    interpret: bool,
    n_valid=None,
) -> jax.Array:
    c, h, w = img_pl.shape
    n = h * w
    if n_valid is None:
        n_valid = n
    if block_r is None:
        block_r = auto_block_r(n, kernel="hist")
    flat = flatten_to_rows(img_pl, block_r)  # (C, R, 1024)
    rows = flat.shape[-2]
    # n_valid statically covering everything: the zero-byte tail pads
    # count into bin 0 and are subtracted below — mask elided at ANY
    # shape (the block-aligned case has n_pad == 0 and subtracts
    # nothing).
    skip_mask = isinstance(n_valid, (int, np.integer)) and int(n_valid) == n
    grid = (rows // block_r,)
    out = pl.pallas_call(
        functools.partial(_hist_kernel, skip_mask=skip_mask),
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, block_r, _LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (c, 16, 16), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, 16, 16), jnp.float32),
        interpret=interpret,
    )(flat, jnp.asarray(n_valid, jnp.int32).reshape(1))
    out = out.reshape(c, 256).astype(jnp.int32)
    n_pad = rows * _LANES - n
    if skip_mask and n_pad:
        out = out.at[:, 0].add(-n_pad)
    return out


@functools.partial(jax.jit, static_argnames=("block_r", "interpret"))
def _hist_call_batched(
    img_cb: jax.Array,  # (C, B, H, W)
    block_r,
    interpret: bool,
) -> jax.Array:
    c, b, h, w = img_cb.shape
    n = h * w
    if block_r is None:
        block_r = auto_block_r(n, kernel="hist")
    flat = flatten_to_rows(img_cb, block_r)  # (C, B, R, 1024)
    r = flat.shape[-2]
    flat = flat.reshape(c, b * r, _LANES)  # frames stacked along rows
    spf = r // block_r
    grid = (b * spf,)
    out = pl.pallas_call(
        # frames share one static n and zero tail pads: mask elided,
        # bin 0 corrected below (exact integer subtraction)
        functools.partial(_hist_kernel, spf=spf, skip_mask=True),
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, block_r, _LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, c, 16, 16), lambda i: (i // spf, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, 16, 16), jnp.float32),
        interpret=interpret,
    )(flat, jnp.asarray(n, jnp.int32).reshape(1))
    out = out.reshape(b, c, 256).astype(jnp.int32)
    n_pad = r * _LANES - n
    if n_pad:
        out = out.at[..., 0].add(-n_pad)
    return out


def planar_histograms_pallas(
    img_pl: jax.Array,
    block_r=None,
    interpret: Optional[bool] = None,
    n_valid=None,
) -> jax.Array:
    """Per-channel 256-bin histograms of a planar uint8 image.

    Accepts ``(C, H, W)`` or ``(B, C, H, W)`` (vmapped; prefer
    :func:`planar_histograms_pallas_batched` on TPU — the vmap batch
    grid dim measured 2.6x slower per pixel than the flat-grid batched
    layout). ``n_valid`` (int or traced scalar) counts only the first N
    row-major pixels — used by sharded callers whose last shard holds
    padding rows. Exact int32 counts (f32 accumulation stays exact:
    per-(channel, bin) count is bounded by the image size; chunk above
    2^24 pixels).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # Static proof hoisted OUT of the jitted _hist_call (where an
    # explicit int n_valid is already a Tracer and isinstance can
    # never see it): a concrete n_valid covering every pixel is the
    # same call as n_valid=None, which _hist_call recognizes
    # statically and elides the positional mask for.
    if (
        isinstance(n_valid, (int, np.integer))
        and int(n_valid) == img_pl.shape[-2] * img_pl.shape[-1]
    ):
        n_valid = None
    if img_pl.ndim == 4:
        return jax.vmap(
            lambda x: _hist_call(x, block_r, interpret, n_valid)
        )(img_pl)
    return _hist_call(img_pl, block_r, interpret, n_valid)


def planar_histograms_pallas_batched(
    img_cb: jax.Array,
    block_r=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Per-channel histograms of a BATCH of planar images, natively
    batched: ``(C, B, H, W)`` uint8 -> ``(B, C, 256)`` int32.

    Frames are stacked along the kernel's flat row dimension (one grid,
    out blocks indexed ``step // steps_per_frame``) instead of a vmap
    batch grid dim — bit-identical counts, no per-frame dispatch and no
    batch-dim Mosaic tax. The channel-leading layout lets the caller
    produce the batch with ONE transpose from ``(B, H, W, C)``
    (``jnp.moveaxis(img, -1, 0)``), the same cost the unbatched path
    pays per frame."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _hist_call_batched(img_cb, block_r, interpret)

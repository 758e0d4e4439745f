"""The fully-fused analysis kernel: WB + indices + stats + colormap,
one HBM read of the image per block.

Per grid step (a block of row-major-flattened pixels), entirely in VMEM:

1. white-balance rescale of the 3 bands from precomputed percentile
   bounds (reference op ordering, process-images.py:438) + floor to the
   uint8 contract,
2. per requested index kind: normalized difference (eps 1e-10, clip
   +/-1),
3. stats partials (sum, sum of squares, min, max, coverage count, 50-bin
   histogram) accumulated across grid steps in the output ref,
4. colormap render via the nibble one-hot MXU factorization (f32
   one-hots, LUT bytes exactly representable, f32 accumulation — exact).

Canonical layout: pixels flattened to (C, R, 1024) rows (see
kernels/hist.py — Mosaic reliably supports only the (block_r, 1024) ->
(1, n) reshape); masks are positional (pos < H*W). The wrapper
flattens/unflattens in XLA.

Mosaic lowering constraints encoded here: no scalar VMEM stores
(full-tensor lane-masked updates), no u8<->f32 casts (hop via int32),
f32 one-hots (i1->bf16 relayout unsupported), 32-bit MXU accumulation,
exact histogram edges via SMEM (XLA f32 division is ~1 ulp off IEEE so
iota-derived edges shift edge-straddling pixels).

Outputs: wb (3,H,W) u8, per-kind index (K,H,W) f32, render (K,3,H,W) u8,
stats partials (K,128) f32. The median is *not* in this kernel: it needs
global information, and runs as the radix-select kernel over the index
output (rgnir_tpu.kernels.select).

jnp reference: rgnir_tpu.pipeline.fused.analyze_image (parity-tested).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rgnir_tpu.color import get_lut
from rgnir_tpu.config import EPSILON, IndexKind
from rgnir_tpu.kernels.hist import _LANES, auto_block_r, flatten_to_rows
from rgnir_tpu.ops.indices import band_indices

# stats partial layout in the (K, 128) output
S_SUM, S_SUMSQ, S_MIN, S_MAX, S_ABOVE = 0, 1, 2, 3, 4
S_HIST = 64  # 50 bins at [64:114]

# Exact f32 histogram edges (np.histogram parity), padded to 64, fed
# through SMEM. The (-1, 1, 50) binning is NOT affine-certifiable
# (np.linspace's f32 edges are not exact 0.04 multiples — 34 of 100
# boundary checks fail, verified 2026-08-17), so the kernel must count
# against the exact edges; a floor((v+1)*25) shortcut would silently
# diverge from np.histogram at edge-straddling pixels. A two-level
# rank + one-hot edge-gather variant (fewer VPU ops on paper) was
# built and REVERTED: it relies on a cross-sublane (8, n) reduce and a
# (n,) -> (br, wc) reshape that real Mosaic silently miscompiles
# (bit-parity failure on chip, 2026-08-17) — the ge
# matrix stays, and workloads that do not need the histogram skip the
# section entirely (with_hist=False).
_EDGES50_PAD = np.concatenate(
    [np.linspace(-1.0, 1.0, 51).astype(np.float32),
     np.full(13, np.inf, np.float32)]
)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _fused_kernel(
    img_ref, bounds_ref, lut_ref, edges_ref, nvalid_ref,
    wb_ref, idx_ref, *out_rest,
    kinds: Tuple[IndexKind, ...],
    with_renders: bool,
    with_round0: bool,
    with_hist: bool = True,
    render_mode: str = "planes",
    round0_kinds: Optional[Tuple[bool, ...]] = None,
    packed_out: bool = False,
    round0_digit: str = "key",
    antipodal: Optional[Tuple[Optional[int], ...]] = None,
    all_valid: bool = False,
    spf: Optional[int] = None,
    pad_zero: bool = False,
):
    out_rest = list(out_rest)
    rgb_ref = out_rest.pop(0) if with_renders else None
    stats_ref = out_rest.pop(0)
    r0_ref = out_rest.pop(0) if with_round0 else None
    step = pl.program_id(0)
    # ``spf`` (static): steps per frame in the BATCHED layout — frames
    # stacked along the flat row dimension, one grid (no vmap batch grid
    # dim, which measured ~1.35x slower per pixel on real Mosaic). The
    # frame-local step drives the positional mask and the accumulator
    # init; the stats/round-0 out BlockSpecs map step -> frame.
    if spf is None:
        fs = step
        frame = None
    else:
        fs = jax.lax.rem(step, spf)
        frame = jax.lax.div(step, spf)
    c, br, wc = img_ref.shape
    n = br * wc
    n_valid = nvalid_ref[0]

    nk = len(kinds)
    lane = jax.lax.broadcasted_iota(jnp.int32, (nk, 128), 1)

    @pl.when(fs == 0)
    def _():
        # Mosaic only allows full-tensor VMEM stores; build the initial
        # stats block with lane masks (min/max seeded at +/-inf).
        init = jnp.zeros((nk, 128), jnp.float32)
        init = jnp.where(lane == S_MIN, jnp.inf, init)
        init = jnp.where(lane == S_MAX, -jnp.inf, init)
        stats_ref[...] = init
        if r0_ref is not None:
            r0_ref[...] = jnp.zeros_like(r0_ref)

    # ``all_valid`` (static): the caller proved every pixel of every
    # block is real (n % 1024 == 0, rows % block_r == 0, n_valid == n)
    # — all 512^2/4096^2/8192^2-class shapes — so the positional mask
    # and every downstream where/multiply it feeds are elided at trace
    # time (~15-25 VPU ops/px on the 3-kind config). The masked forms
    # are bitwise identical when the mask is all-true (x*1.0 and
    # where(True, x, _) are exact identities), so this is purely an
    # op-count cut.
    #
    # ``pad_zero`` (static): the shape has tail padding but the caller
    # proved the pads are ZERO bytes and n_valid == n (fused.py wrapper
    # — every unsharded call). Zero bytes flow through WB to wb == 0
    # exactly (lo >= 0 clips (0-lo) to 0) and through every index to
    # idx == +/-0.0 exactly, which is NEUTRAL for sum/sumsq (x + 0.0
    # is an exact identity; idx is never -0.0 — see pipeline notes) and
    # coverage (0.0 > thr is false for the gated thr >= 0), and lands
    # at a STATICALLY KNOWN histogram/round-0 bin (0.0's edges / byte
    # 128) that the wrapper subtracts n_pad from after the kernel. So
    # the per-pixel mask is elided from EVERY per-pixel op; only
    # min/max genuinely need it, and padding lives solely in each
    # frame's LAST block — a predicated dual store (below) pays the
    # mask there alone, amortizing it to ~zero for multi-block frames
    # (e.g. 1080p's 2025 rows, which have no block-aligned divisor).
    if all_valid or pad_zero:
        valid = validf = None
    else:
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (br, wc), 0) * wc
            + jax.lax.broadcasted_iota(jnp.int32, (br, wc), 1)
            + fs * n
        )
        valid = pos < n_valid
        validf = valid.astype(jnp.float32)

    # --- white balance (3 bands) ---------------------------------------
    wb = []
    wb_i32 = []
    for ch in range(c):
        # Mosaic lacks direct u8<->f32 casts; hop through int32.
        x = img_ref[ch].astype(jnp.int32).astype(jnp.float32)
        if frame is None:
            lo = bounds_ref[0, ch]
            span = bounds_ref[1, ch] - lo
        else:
            # batched: per-frame WB bounds, SMEM-indexed by frame id
            lo = bounds_ref[frame, 0, ch]
            span = bounds_ref[frame, 1, ch] - lo
        corrected = (x - lo) / span * 255.0
        corrected = jnp.where(span > 0, corrected, 0.0)
        corrected = jnp.clip(corrected, 0.0, 255.0)
        # the uint8 value as float (truncation), reused by the indices
        wbf = jnp.floor(corrected)
        if packed_out:
            wb_i32.append(wbf.astype(jnp.int32))
        else:
            wb_ref[ch] = wbf.astype(jnp.int32).astype(jnp.uint8)
        wb.append(wbf)
    if packed_out:
        # One i32 store of r | g<<8 | b<<16 replaces three u8 stores
        # and their 4:1 lane-packing cast chains; the caller recovers
        # HWC u8 by bitcast+slice (free, and it also replaces the
        # downstream planar->HWC transpose pass).
        wb_ref[...] = wb_i32[0] | (wb_i32[1] << 8) | (wb_i32[2] << 16)

    nib_col = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)

    plane_sum = None
    if with_renders and render_mode == "planes2":
        # (16, 48) 0/1 plane-summing matrix for the planes2 MXU
        # plane-sum: row l has ones at columns l, 16+l, 32+l. Built from
        # iotas (n-independent, negligible); 0/1 entries are bf16-exact.
        prow = jax.lax.broadcasted_iota(jnp.int32, (16, 48), 0)
        pcol = jax.lax.broadcasted_iota(jnp.int32, (16, 48), 1)
        plane_sum = jnp.where(
            (pcol & 15) == prow, jnp.float32(1), jnp.float32(0)
        )

    add_rows = []
    min_scalars = []
    max_scalars = []
    idx_by_kind = []
    for k, kind in enumerate(kinds):
        partner = antipodal[k] if antipodal is not None else None
        if partner is not None:
            # Antipodal derivation (kernels/pipeline._median_plan): the
            # partner's map negates EXACTLY (numerators negate, the eps
            # denominators are identical), so one negate replaces the
            # sub/add/div/clip chain — and sum/sumsq/min/max negate
            # exactly too, so this kind's lanes stay neutral (the
            # pipeline derives them from the partner's row). Coverage
            # has its own threshold and is still counted below; the
            # render and (with_hist) histogram sections also still run
            # on idx (histogram bins do NOT mirror under negation —
            # left-closed edges flip).
            idx = -idx_by_kind[partner]
        else:
            ia, ib = band_indices(kind)
            a, b = wb[ia], wb[ib]
            idx = jnp.clip(
                (a - b) / (a + b + jnp.float32(EPSILON)), -1.0, 1.0
            )
        idx_by_kind.append(idx)
        idx_ref[k] = idx

        # --- stats partials (gathered into one (nk, 128) update) -------
        # Masked-value form: padding pixels become -2.0, below every
        # histogram edge and both coverage thresholds, so the ge matrix
        # and coverage count need no broadcast AND (one select on
        # (br, wc) instead — the 5-7x trick of benchmarks/exp_hist.py).
        idx_m = (
            idx if valid is None
            else jnp.where(valid, idx, jnp.float32(-2.0))
        )
        if partner is None:
            if valid is None:
                s_sum = jnp.sum(idx)
                s_sumsq = jnp.sum(idx * idx)
                min_scalars.append(jnp.min(idx))
            else:
                s_sum = jnp.sum(idx * validf)
                s_sumsq = jnp.sum(idx * idx * validf)
                min_scalars.append(
                    jnp.min(jnp.where(valid, idx, jnp.inf))
                )
            max_scalars.append(jnp.max(idx_m))
        else:
            s_sum = s_sumsq = jnp.float32(0.0)
            # neutral under the min/max lane accumulate
            min_scalars.append(jnp.float32(jnp.inf))
            max_scalars.append(jnp.float32(-jnp.inf))
        thr = jnp.float32(kind.coverage_threshold)
        s_above = jnp.sum((idx_m > thr).astype(jnp.float32))

        # 50-bin histogram: cumulative counts C[i] = #(v >= edge_i)
        # against the exact f32 edges — one ge matrix, lane-reduced on
        # the VPU (an M=1 MXU dot leaves the systolic array idle and
        # measured ~8% slower, benchmarks/exp_int8.py); the wrapper
        # differences adjacent C into bins (right-closed last).
        # Optional (with_hist): the reference's analyze_index
        # (process-images.py:492-513) computes NO histogram — only the
        # single-report flow does — so stats-parity workloads skip the
        # section (and its ~128 VPU ops/pixel, the kernel's largest
        # single cost) entirely. A two-level-rank variant with fewer
        # ops was reverted: real Mosaic silently miscompiled its
        # cross-sublane reduce / (n,)->(br,wc) reshape (bit-parity
        # failure on chip, 2026-08-17).
        cum = None
        if with_hist:
            edges_col = jnp.concatenate(
                [edges_ref[j].reshape(1, 1) for j in range(51)]
                + [jnp.full((13, 1), jnp.inf, jnp.float32)],
                axis=0,
            )  # (64, 1)
            idx_row = idx_m.reshape(1, n)  # padding -2.0 < every edge
            ge = jnp.where(
                idx_row >= edges_col,
                jnp.float32(1), jnp.float32(0),
            )  # (64, n); exact 0/1 counts in f32
            cum = jnp.sum(ge, axis=1).reshape(1, 64)

        lane1 = lane[:1]  # (1, 128)
        row = jnp.where(lane1 == S_SUM, s_sum, 0.0)
        row = jnp.where(lane1 == S_SUMSQ, s_sumsq, row)
        row = jnp.where(lane1 == S_ABOVE, s_above, row)
        if cum is not None:
            # lanes [64:128) hold the cumulative histogram counts
            row = jnp.where(
                lane1 >= S_HIST,
                jnp.concatenate(
                    [jnp.zeros((1, 64), jnp.float32), cum], axis=1
                ),
                row,
            )
        add_rows.append(row)

        # --- radix-select round 0 (top-byte histogram) -----------------
        # The median select (kernels/select.py) re-reads the index maps
        # once per radix round; its round 0 needs no prefix, so emit its
        # byte histogram HERE while idx is still in VMEM — one fewer
        # full HBM pass downstream. Same key/one-hot construction as
        # _byte_hist_kernel (invalid -> byte 256, matching nothing).
        # ``round0_kinds`` masks kinds whose median is DERIVED from an
        # antipodal partner (NDWI = -GNDVI exactly; kernels/pipeline
        # _median_plan) — their select never runs, so their round-0
        # one-hots (~64 VPU element-ops/px) are skipped and the output
        # row stays zero.
        emit_r0 = r0_ref is not None and (
            round0_kinds is None or round0_kinds[k]
        )
        # --- render byte + shared one-hots ------------------------------
        # round0_digit="q24": the select's round-0 digit is the RENDER
        # byte i256 (the top byte of the 24-bit quantized key — see
        # select.py key_mode="q24"), so one masked one-hot pair serves
        # BOTH the colormap gather and the round-0 histogram; the whole
        # round-0 section collapses to one extra MXU dot when renders
        # are on. Invalid pixels carry i256=256 (hi one-hot all-zero:
        # counts nothing, renders 0 — padding is sliced off anyway).
        need_i256 = with_renders or (emit_r0 and round0_digit == "q24")
        oh_hiT = oh_loT = mask_loT = None
        if need_i256:
            # No max(., 0) needed: idx is clipped to [-1, 1], so
            # (idx + 1) * 128 >= 0 and floor/cast stay non-negative.
            i256 = jnp.minimum(
                jnp.floor(
                    (idx + 1.0) * jnp.float32(128.0)
                ).astype(jnp.int32),
                255,
            )
            if round0_digit == "q24" and valid is not None:
                i256 = jnp.where(valid, i256, 256)
            i256 = i256.reshape(1, n)
            oh_hiT = jnp.where(
                (i256 >> 4) == nib_col, jnp.float32(1), jnp.float32(0)
            )  # (16, n)
            if with_renders and render_mode == "planes2":
                # planes2's multiply-reduce selects on the i1 mask
                # directly; the f32 lo one-hot is only materialized
                # when the round-0 dot needs an MXU operand.
                mask_loT = (i256 & 15) == nib_col  # (16, n) i1
            if (
                with_renders
                and render_mode in ("dots", "packed_mr", "planes")
            ) or (emit_r0 and round0_digit == "q24"):
                oh_loT = jnp.where(
                    (i256 & 15) == nib_col, jnp.float32(1), jnp.float32(0)
                )  # (16, n)

        # --- radix-select round 0 (top-byte histogram) -----------------
        # The median select (kernels/select.py) re-reads the index maps
        # once per radix round; its round 0 needs no prefix, so emit its
        # byte histogram HERE while idx is still in VMEM — one fewer
        # full HBM pass downstream. ``round0_kinds`` masks kinds whose
        # median is DERIVED from an antipodal partner (NDWI = -GNDVI
        # exactly; kernels/pipeline._median_plan) — their select never
        # runs, so their round-0 one-hots are skipped and the output
        # row stays zero.
        if emit_r0:
            if round0_digit == "q24":
                r0_hi, r0_lo = oh_hiT, oh_loT
            else:
                # f32 bit-key top byte (general-values path); same
                # key/one-hot construction as _byte_hist_kernel
                # (invalid -> byte 256, matching nothing).
                bits = jax.lax.bitcast_convert_type(idx, jnp.uint32)
                keys = jnp.where(
                    bits >> 31 == 1, ~bits, bits | jnp.uint32(0x80000000)
                )
                kbyte = (keys >> jnp.uint32(24)).astype(jnp.int32)
                if valid is not None:
                    kbyte = jnp.where(valid, kbyte, 256)
                kbyte = kbyte.reshape(1, n)
                r0_hi = jnp.where(
                    (kbyte >> 4) == nib_col, jnp.float32(1), jnp.float32(0)
                )
                r0_lo = jnp.where(
                    (kbyte & 15) == nib_col, jnp.float32(1), jnp.float32(0)
                )
            r0_ref[k] += jax.lax.dot_general(
                r0_hi, r0_lo,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)

        # --- colormap render (nibble one-hot MXU LUT) ------------------
        if not with_renders:
            continue
        if render_mode == "packed":
            # Packed-LUT gather: the three channel bytes ride ONE f32 as
            # r*65536 + g*256 + b (< 2^24, f32-exact). One HIGHEST-
            # precision MXU contraction of the hi one-hot (Mosaic's
            # 3-pass f32 decomposition is exact here: the one-hot picks
            # a single 24-bit-int row per column — verified bit-exact on
            # real Mosaic, benchmarks/exp_render.py), then a 4-level
            # binary select tree gathers the lo nibble (15 broadcast
            # selects vs a 16-row multiply-reduce per channel). Replaces
            # 3 dots + 3 multiply-reduces + the lo one-hot (~100 fewer
            # VPU ops/pixel/kind on paper) but MEASURES SLOWER than
            # "dots" (4.71 vs 3.22 ms at config-2 shapes): the select
            # tree's (half,n) splits force sublane relayouts Mosaic
            # can't fuse. Kept bit-identical for A/B only.
            candT = jax.lax.dot_general(
                lut_ref[k], oh_hiT,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (16{lo}, n) packed values
            lo_nib = i256 & 15  # (1, n)
            t = candT
            for bit in (3, 2, 1, 0):
                half = t.shape[0] // 2
                t = jnp.where(
                    (lo_nib & (1 << bit)) != 0, t[half:], t[:half]
                )
            packed = t.astype(jnp.int32)  # (1, n)
            for ch, sh in ((0, 16), (1, 8), (2, 0)):
                rgb_ref[k, ch] = (
                    ((packed >> sh) & 255)
                    .reshape(br, wc).astype(jnp.uint8)
                )
        elif render_mode == "planes":
            # Byte-plane packed LUT, DEFAULT-precision dot. lut_ref[k]
            # is (16{hi}, 48): columns [0,16) hold r*65536 for each lo
            # nibble, [16,32) g*256, [32,48) b. Every entry is
            # bf16-EXACT (a byte times a power of two needs 8 mantissa
            # bits), and the one-hot is 0/1, so Mosaic's default 1-pass
            # bf16 matmul truncates nothing — same exactness argument
            # as the "dots" byte tables, no Precision API. ONE dot
            # yields all three planes; their f32 sum (< 2^24) is the
            # exact packed value; ONE lo multiply-reduce + byte unpack
            # replaces the three per-channel multiply-reduces
            # (~180 fewer VPU element-ops/px/kind than "dots").
            candT = jax.lax.dot_general(
                lut_ref[k], oh_hiT,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (48, n): three (16{lo}, n) planes
            cand = candT[0:16] + candT[16:32] + candT[32:48]
            val = jnp.sum(oh_loT * cand, axis=0, keepdims=True)  # (1, n)
            packed = val.astype(jnp.int32)
            if packed_out:
                # r|g<<8|b<<16 little-endian layout for unpack_rgb_hwc
                po = (
                    ((packed >> 16) & 255)
                    | (packed & 0xFF00)
                    | ((packed & 255) << 16)
                )
                rgb_ref[k] = po.reshape(br, wc)
            else:
                for ch, sh in ((0, 16), (1, 8), (2, 0)):
                    rgb_ref[k, ch] = (
                        ((packed >> sh) & 255)
                        .reshape(br, wc).astype(jnp.uint8)
                    )
        elif render_mode == "planes2":
            # planes + two structural changes, both exact — and a
            # measured LOSER, kept bit-identical for A/B only
            # (exp_render.py ab, 2026-08-17: planes 2.82 ms, planes2
            # 3.80; isolation: the P-dot alone regresses to 3.88, the
            # mask-mr alone is neutral at 2.87 — Mosaic dots carry
            # VPU-side operand staging proportional to the (48, n)
            # input, so "the MXU is idle" does not make a second dot
            # free). The original intent:
            # 1. The plane sum (2 f32 adds over (16, n) = ~32 VPU
            #    element-ops/px/kind in "planes") moves to the idle MXU
            #    as a SECOND default-precision dot: plane_sum (16, 48)
            #    is 0/1 and candT's entries are single byte-plane
            #    values byte*2^k (<= 8 mantissa bits) — BOTH operands
            #    bf16-exact, so Mosaic's 1-pass bf16 matmul truncates
            #    nothing and the f32 accumulation of 3 terms < 2^24 is
            #    exact (same argument as the first dot).
            # 2. The lo-nibble multiply-reduce selects on the i1
            #    compare mask directly (select instead of multiply —
            #    same op count), so the f32 lo one-hot need not be
            #    built at all unless the round-0 dot consumes it
            #    (saves its 32 ops/px for derived kinds like NDWI).
            candT = jax.lax.dot_general(
                lut_ref[k], oh_hiT,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (48, n): three (16{lo}, n) byte planes
            cand = jax.lax.dot_general(
                plane_sum, candT,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (16{lo}, n) packed 24-bit values
            val = jnp.sum(
                jnp.where(mask_loT, cand, jnp.float32(0)),
                axis=0, keepdims=True,
            )  # (1, n)
            packed = val.astype(jnp.int32)
            if packed_out:
                po = (
                    ((packed >> 16) & 255)
                    | (packed & 0xFF00)
                    | ((packed & 255) << 16)
                )
                rgb_ref[k] = po.reshape(br, wc)
            else:
                for ch, sh in ((0, 16), (1, 8), (2, 0)):
                    rgb_ref[k, ch] = (
                        ((packed >> sh) & 255)
                        .reshape(br, wc).astype(jnp.uint8)
                    )
        elif render_mode == "packed_mr":
            # Packed LUT + multiply-reduce gather: ONE HIGHEST-precision
            # MXU contraction of the hi one-hot against the 24-bit-int
            # packed table (bit-exact on real Mosaic, probed by
            # benchmarks/exp_render.py), then the SAME lo one-hot
            # multiply-reduce idiom as "dots" — exact because every
            # column has exactly one nonzero term (0*v = ±0 and v + ±0
            # are exact in f32 at any magnitude). Replaces 3 dots + 3
            # multiply-reduces with 1 dot + 1 multiply-reduce, with no
            # select-tree relayouts (~60 fewer VPU element-ops/px/kind
            # than "dots").
            candT = jax.lax.dot_general(
                lut_ref[k], oh_hiT,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (16{lo}, n) packed values
            val = jnp.sum(oh_loT * candT, axis=0, keepdims=True)  # (1, n)
            packed = val.astype(jnp.int32)
            for ch, sh in ((0, 16), (1, 8), (2, 0)):
                rgb_ref[k, ch] = (
                    ((packed >> sh) & 255)
                    .reshape(br, wc).astype(jnp.uint8)
                )
        elif render_mode == "tree":
            # Per-channel byte dots (bf16-exact operands, as in "dots")
            # but the lo-nibble gather runs as a 4-level binary select
            # tree: 15 broadcast selects per channel replace BOTH the
            # lo one-hot (32 ops, built once) and the 16-row
            # multiply-reduce (31 ops per channel). Also MEASURES
            # SLOWER than "dots" (4.05 vs 3.22 ms) for the same
            # relayout reason — kept for A/B only.
            lo_nib = i256 & 15
            for ch in range(3):
                candT = jax.lax.dot_general(
                    lut_ref[k, ch], oh_hiT,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (16{lo}, n)
                t = candT
                for bit in (3, 2, 1, 0):
                    half = t.shape[0] // 2
                    t = jnp.where(
                        (lo_nib & (1 << bit)) != 0, t[half:], t[:half]
                    )
                rgb_ref[k, ch] = (
                    t.reshape(br, wc).astype(jnp.int32).astype(jnp.uint8)
                )
        else:
            ch_i32 = []
            for ch in range(3):
                # candT[l, i] = lut[hi_i, l, ch]: contract the hi
                # one-hot. lut_ref layout (K, 3, 16{hi}, 16{lo}).
                candT = jax.lax.dot_general(
                    lut_ref[k, ch], oh_hiT,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (16{lo}, n)
                val = jnp.sum(oh_loT * candT, axis=0, keepdims=True)
                if packed_out:
                    ch_i32.append(val.astype(jnp.int32))
                else:
                    rgb_ref[k, ch] = (
                        val.reshape(br, wc)
                        .astype(jnp.int32).astype(jnp.uint8)
                    )
            if packed_out:
                packed = ch_i32[0] | (ch_i32[1] << 8) | (ch_i32[2] << 16)
                rgb_ref[k] = packed.reshape(br, wc)

    # single full-tensor stats update (Mosaic allows no scalar stores)
    add = jnp.concatenate(add_rows, axis=0)

    def _store(mins, maxs):
        old = stats_ref[...]
        new = old + add
        tmin = jnp.concatenate(
            [s.reshape(1, 1) for s in mins], axis=0
        )  # (nk, 1)
        tmax = jnp.concatenate([s.reshape(1, 1) for s in maxs], axis=0)
        new = jnp.where(lane == S_MIN, jnp.minimum(old, tmin), new)
        new = jnp.where(lane == S_MAX, jnp.maximum(old, tmax), new)
        stats_ref[...] = new

    if not pad_zero:
        _store(min_scalars, max_scalars)
    else:
        # pad_zero: min/max are the ONLY stats the pads can corrupt
        # (idx_pad == 0.0 can shadow an all-positive min or an
        # all-negative max), and pads live solely in each frame's LAST
        # block — so every other block stores the unmasked reductions,
        # and the last block alone builds the positional mask and
        # re-reduces min/max under it. Both regions are full stores of
        # the same ``add``; only the min/max lanes differ.
        steps_pf = spf if spf is not None else pl.num_programs(0)
        is_last = fs == steps_pf - 1

        @pl.when(jnp.logical_not(is_last))
        def _():
            _store(min_scalars, max_scalars)

        @pl.when(is_last)
        def _():
            pos = (
                jax.lax.broadcasted_iota(jnp.int32, (br, wc), 0) * wc
                + jax.lax.broadcasted_iota(jnp.int32, (br, wc), 1)
                + fs * n
            )
            lvalid = pos < n_valid
            mins, maxs = [], []
            for k2 in range(nk):
                p2 = antipodal[k2] if antipodal is not None else None
                if p2 is not None:
                    mins.append(jnp.float32(jnp.inf))
                    maxs.append(jnp.float32(-jnp.inf))
                else:
                    iv = idx_by_kind[k2]
                    mins.append(
                        jnp.min(jnp.where(lvalid, iv, jnp.inf))
                    )
                    maxs.append(
                        jnp.max(jnp.where(lvalid, iv, -jnp.inf))
                    )
            _store(mins, maxs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "kinds", "block_r", "interpret", "with_renders", "with_round0",
        "with_hist", "render_mode", "round0_kinds", "packed_out",
        "round0_digit", "antipodal", "all_valid", "with_idx_rows",
        "pad_zero",
    ),
)
def _fused_call(
    img_pl: jax.Array,   # (C, H, W) or batched (C, B, H, W)
    bounds: jax.Array,   # (2, C) f32 lo/hi; batched (B, 2, C)
    kinds: Tuple[IndexKind, ...],
    block_r,
    interpret: bool,
    n_valid=None,
    with_renders: bool = True,
    with_round0: bool = False,
    with_hist: bool = True,
    render_mode: str = "planes",
    round0_kinds: Optional[Tuple[bool, ...]] = None,
    packed_out: bool = False,
    round0_digit: str = "key",
    antipodal: Optional[Tuple[Optional[int], ...]] = None,
    all_valid: bool = False,
    with_idx_rows: bool = False,
    pad_zero: bool = False,
):
    batched = img_pl.ndim == 4
    if batched:
        c, b, h, w = img_pl.shape
    else:
        c, h, w = img_pl.shape
        b = None
    k = len(kinds)
    n = h * w
    if n_valid is None:
        n_valid = n
    if block_r is None:
        # The 50-bin histogram's (64, n_blk) ge matrix dominates the
        # working set when present, so hist-on and hist-off footprints
        # have DIFFERENT VMEM ceilings — they are tuned as separate
        # autotune variants. Hist-off (the batch/stream/mosaic paths)
        # measured monotonically faster up to block_r=64 at the 3-kind
        # +renders footprint (benchmarks/exp_blockr_fused.py,
        # 2026-08-19: br8 2.91 / br16 2.78 / br32 2.722 / br64
        # 2.687 ms; br128 exceeds the 16 MB scoped-VMEM limit), so its
        # heuristic cap is 64; hist-on keeps the conservative 32.
        if with_hist:
            block_r = auto_block_r(n, cap=32, kernel="fused_hist")
        else:
            # the per-kind working set scales with K: beyond the swept
            # 3-kind footprint keep the conservative cap AND skip the
            # tuned winner (both were measured at K<=3; a register_
            # index() call can legally ask for many kinds at once)
            if k <= 3:
                block_r = auto_block_r(n, cap=64, kernel="fused")
            else:
                block_r = auto_block_r(n, cap=32)
    flat = flatten_to_rows(img_pl, block_r)  # (C, [B,] R, 1024)
    rpf = flat.shape[-2]  # rows per frame
    if batched:
        # frames stacked along the flat row dimension: ONE grid, no
        # vmap batch grid dim (see _fused_kernel ``spf``)
        flat = flat.reshape(c, b * rpf, _LANES)
        spf = rpf // block_r
    else:
        spf = None
    rows = flat.shape[-2]
    if render_mode in ("planes", "planes2"):
        # (K, 16{hi}, 48) byte-plane tables: cols [0,16) r*65536 per lo
        # nibble, [16,32) g*256, [32,48) b — each entry bf16-exact.
        luts = np.stack(
            [
                np.concatenate(
                    [
                        get_lut(kind.cmap_name)[:, ch]
                        .reshape(16, 16)
                        .astype(np.float32) * scale
                        for ch, scale in ((0, 65536.0), (1, 256.0), (2, 1.0))
                    ],
                    axis=1,
                )
                for kind in kinds
            ]
        ).astype(np.float32)
        lut_spec = pl.BlockSpec((k, 16, 48), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    elif render_mode in ("packed", "packed_mr"):
        # (K, 16{hi}, 16{lo}) tables of r*65536 + g*256 + b (f32-exact
        # 24-bit ints; unpacked in-kernel after the lo-nibble gather)
        luts = np.stack(
            [
                get_lut(kind.cmap_name)[:, :3]
                .astype(np.int64)
                .reshape(16, 16, 3)
                @ np.array([65536, 256, 1], np.int64)
                for kind in kinds
            ]
        ).astype(np.float32)
        lut_spec = pl.BlockSpec((k, 16, 16), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        # (K, 3, 16{hi}, 16{lo}) byte tables
        luts = np.stack(
            [
                get_lut(kind.cmap_name)[:, :3]
                .reshape(16, 16, 3)
                .transpose(2, 0, 1)
                .astype(np.float32)
                for kind in kinds
            ]
        )
        lut_spec = pl.BlockSpec((k, 3, 16, 16), lambda i: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    grid = (rows // block_r,)
    kernel = functools.partial(
        _fused_kernel, kinds=kinds, with_renders=with_renders,
        with_round0=with_round0, with_hist=with_hist,
        render_mode=render_mode, round0_kinds=round0_kinds,
        packed_out=packed_out, round0_digit=round0_digit,
        antipodal=antipodal, all_valid=all_valid, spf=spf,
        pad_zero=pad_zero,
    )
    if batched:
        bounds_spec = pl.BlockSpec((b, 2, c), lambda i: (0, 0, 0),
                                   memory_space=pltpu.SMEM)
        # per-frame accumulator blocks: consecutive grid steps revisit
        # one frame's block, then the index map advances to the next
        stats_spec = pl.BlockSpec((None, k, 128),
                                  lambda i: (i // spf, 0, 0),
                                  memory_space=pltpu.VMEM)
        stats_shape = jax.ShapeDtypeStruct((b, k, 128), jnp.float32)
        r0_spec = pl.BlockSpec((None, k, 16, 16),
                               lambda i: (i // spf, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        r0_shape = jax.ShapeDtypeStruct((b, k, 16, 16), jnp.int32)
    else:
        bounds_spec = pl.BlockSpec((2, c), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM)
        stats_spec = pl.BlockSpec((k, 128), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
        stats_shape = jax.ShapeDtypeStruct((k, 128), jnp.float32)
        r0_spec = pl.BlockSpec((k, 16, 16), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
        r0_shape = jax.ShapeDtypeStruct((k, 16, 16), jnp.int32)
    if packed_out:
        wb_spec = pl.BlockSpec((block_r, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        wb_shape = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
        rgb_spec = pl.BlockSpec((k, block_r, _LANES), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        rgb_shape = jax.ShapeDtypeStruct((k, rows, _LANES), jnp.int32)
    else:
        wb_spec = pl.BlockSpec((c, block_r, _LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)
        wb_shape = jax.ShapeDtypeStruct((c, rows, _LANES), jnp.uint8)
        rgb_spec = pl.BlockSpec((k, c, block_r, _LANES),
                                lambda i: (0, 0, i, 0),
                                memory_space=pltpu.VMEM)
        rgb_shape = jax.ShapeDtypeStruct((k, c, rows, _LANES), jnp.uint8)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, block_r, _LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            bounds_spec,
            lut_spec,
            pl.BlockSpec((64,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(
            [
                wb_spec,
                pl.BlockSpec((k, block_r, _LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ]
            + ([rgb_spec] if with_renders else [])
            + [stats_spec]
            + ([r0_spec] if with_round0 else [])
        ),
        out_shape=tuple(
            [
                wb_shape,
                jax.ShapeDtypeStruct((k, rows, _LANES), jnp.float32),
            ]
            + ([rgb_shape] if with_renders else [])
            + [stats_shape]
            + ([r0_shape] if with_round0 else [])
        ),
        interpret=interpret,
    )(
        flat, bounds, jnp.asarray(luts, jnp.float32),
        jnp.asarray(_EDGES50_PAD),
        jnp.asarray(n_valid, jnp.int32).reshape(1),
    )
    out = list(out)
    wb = out.pop(0)
    idx = out.pop(0)
    rgb = out.pop(0) if with_renders else None
    stats = out.pop(0)
    if with_round0:
        r0 = out.pop(0)
        r0 = r0.reshape(b, k, 256) if batched else r0.reshape(k, 256)
    else:
        r0 = None
    # the kernel's raw row layout of the index maps — feed this straight
    # to the radix-select (masked_median_pallas_rows): no slice, no
    # repack/repad pass (the select masks the same tail positionally)
    idx_rows = (
        idx.reshape(k, b, rpf, _LANES) if batched
        else idx.reshape(k, rpf, _LANES)
    ) if with_idx_rows else None
    # unflatten + drop tail padding (XLA-side reshapes, contiguous)
    if batched:
        if packed_out:
            wb = wb.reshape(b, rpf * _LANES)[:, :n].reshape(b, h, w)
        else:
            wb = (
                wb.reshape(c, b, rpf * _LANES)[:, :, :n]
                .reshape(c, b, h, w)
            )
        idx = idx.reshape(k, b, rpf * _LANES)[:, :, :n].reshape(k, b, h, w)
        if rgb is not None:
            if packed_out:
                rgb = (
                    rgb.reshape(k, b, rpf * _LANES)[:, :, :n]
                    .reshape(k, b, h, w)
                )
            else:
                rgb = (
                    rgb.reshape(k, c, b, rpf * _LANES)[..., :n]
                    .reshape(k, c, b, h, w)
                )
    else:
        if packed_out:
            wb = wb.reshape(-1)[:n].reshape(h, w)
        else:
            wb = wb.reshape(c, -1)[:, :n].reshape(c, h, w)
        idx = idx.reshape(k, -1)[:, :n].reshape(k, h, w)
        if rgb is not None:
            if packed_out:
                rgb = rgb.reshape(k, -1)[:, :n].reshape(k, h, w)
            else:
                rgb = rgb.reshape(k, c, -1)[:, :, :n].reshape(k, c, h, w)
    # pad_zero corrections (static integer counts, exact): the pads'
    # index value is exactly +/-0.0 (-0.0 for DERIVED antipodal kinds,
    # whose kernel body negates the partner's +0.0), so they
    # incremented (a) every cumulative >=-edge lane whose edge <= 0.0
    # (-0.0 >= e and +0.0 >= e agree at every edge) and (b) a round-0
    # byte that depends on the digit and the sign: q24 quantization
    # floor((+/-0.0+1)*128) = 128 either way, and the f32 bit-key top
    # byte is 128 for +0.0 (0x00.. | 0x80000000) but 127 for -0.0
    # (~0x80000000 = 0x7FFF..). Subtract the per-frame pad count from
    # exactly those cells — the comparisons below are the same f32
    # comparisons the kernel made.
    n_pad = rpf * _LANES - n
    if pad_zero and n_pad:
        if with_hist:
            cum_corr = jnp.asarray(
                (np.float32(0.0) >= _EDGES50_PAD[:51])
                .astype(np.float32) * n_pad
            )
            stats = stats.at[..., S_HIST:S_HIST + 51].add(-cum_corr)
        if with_round0:
            emitted_by_byte = {128: [0] * k, 127: [0] * k}
            for i in range(k):
                if not (round0_kinds is None or round0_kinds[i]):
                    continue
                derived = antipodal is not None and (
                    antipodal[i] is not None
                )
                byte = (
                    127 if (round0_digit == "key" and derived) else 128
                )
                emitted_by_byte[byte][i] = n_pad
            for byte, emitted in emitted_by_byte.items():
                if any(emitted):
                    r0 = r0.at[..., byte].add(
                        -jnp.asarray(np.array(emitted, np.int32))
                    )
    # Convert cumulative >=-edge counts into per-bin counts:
    # hist[i] = C[i] - C[i+1] for i < 49; hist[49] = C[49]
    # (right-closed; values above edge 50 are impossible for clipped
    # indices). With with_hist=False the lanes stay zero — callers
    # surface histogram=None, never silent zero counts.
    if with_hist:
        cum = stats[..., S_HIST:S_HIST + 51]
        bins = cum[..., :49] - cum[..., 1:50]
        stats = stats.at[..., S_HIST:S_HIST + 49].set(bins)
        stats = stats.at[..., S_HIST + 49].set(cum[..., 49])
        stats = stats.at[..., S_HIST + 50:].set(0.0)
    ret = [wb, idx, rgb, stats]
    if with_round0:
        ret.append(r0)
    if with_idx_rows:
        ret.append(idx_rows)
    return tuple(ret)


def fused_analyze_pallas(
    img_pl: jax.Array,
    lo: jax.Array,
    hi: jax.Array,
    kinds: Sequence[Union[IndexKind, str]],
    block_r=None,
    interpret: Optional[bool] = None,
    n_valid=None,
    with_renders: bool = True,
    with_round0: bool = False,
    with_hist: bool = True,
    render_mode: str = "planes",
    round0_kinds: Optional[Tuple[bool, ...]] = None,
    packed_out: bool = False,
    round0_digit: str = "key",
    antipodal: Optional[Tuple[Optional[int], ...]] = None,
    with_idx_rows: bool = False,
    bounds_nonneg: Optional[bool] = None,
):
    """Fused WB+index+stats+render of a planar ``(3, H, W)`` uint8 image,
    or a NATIVELY BATCHED ``(3, B, H, W)`` batch of same-shape images.

    ``lo``/``hi``: per-channel WB bounds (from the histogram kernel);
    batched: ``(B, C)`` per-frame bounds. ``n_valid`` (int or traced):
    count of valid row-major pixels for stats masking (sharded callers
    pass their shard's live count; batched frames share one count).
    Returns ``(wb_planar u8, index (K,H,W) f32, rgb (K,3,H,W) u8,
    stats_partials (K,128) f32)`` with the S_* layout of this module —
    batched shapes grow a B dim after the kind dim (idx/rgb) or lead
    with it (stats ``(B,K,128)``, wb ``(C,B,H,W)``); with
    ``with_round0`` a fifth element — the median radix-select's
    round-0 byte histogram, ``(K, 256) int32`` (batched
    ``(B, K, 256)``) — is appended (feed it to
    ``kernels.select.masked_median_pallas(round0_hist=...)`` to skip
    one full read of the index maps); with ``with_idx_rows`` a final
    element — the index maps in the kernel's raw row layout
    ``(K, R, 1024)`` / ``(K, B, R, 1024)`` including tail padding —
    is appended for zero-copy hand-off to
    ``kernels.select.masked_median_pallas_rows``.

    Batched mode runs ONE flat grid with frames stacked along the row
    dimension and per-frame accumulator blocks — bit-identical to
    per-frame calls, with none of the vmap batch-grid-dim tax
    (measured ~1.35x per pixel on real Mosaic for this kernel).

    ``render_mode``: ``"planes"`` (default) — ONE default-precision MXU
    dot of the hi one-hot against a byte-plane packed LUT (every entry
    bf16-exact, so Mosaic's 1-pass bf16 matmul is lossless) + one lo
    multiply-reduce + byte unpack. Measured winner on real Mosaic
    (config-2 shapes, same-window slopes, 2026-08-17: planes 2.92 ms,
    ``"dots"`` 3.07, ``"tree"`` 3.92, ``"packed_mr"`` 4.39, ``"packed"``
    4.65). The losers are kept bit-identical for A/B: select trees
    introduce sublane relayouts, and the HIGHEST-precision packed dot's
    operand splitting outweighs the ops it saves (Precision.HIGH is
    unsupported by Mosaic); see benchmarks/exp_render.py.

    ``round0_digit``: ``"key"`` (default) — the round-0 histogram bins
    the f32 bit-key top byte (general values). ``"q24"`` — it bins the
    RENDER byte i256 (= the top byte of select.py's 24-bit quantized
    key), reusing the colormap one-hots when renders are on (round 0
    collapses to one extra MXU dot) and feeding
    ``masked_median_pallas(quantized=True)``'s 3-round select. Only
    exact for index-map-like values (see that docstring).

    ``antipodal``: per-kind index of an EARLIER kind whose band pair
    is this kind's swap (or None) — kernels/pipeline._median_plan. A
    derived kind's index map is one exact negate instead of the
    sub/add/div/clip chain, and its sum/sumsq/min/max lanes stay
    neutral (the caller derives them by negating the partner's row —
    exact, since f32 negation commutes with every reduction add).
    Coverage, renders, and the optional histogram still compute.

    ``packed_out``: wb and renders come back as ``(H, W)`` /
    ``(K, H, W)`` int32 with bytes ``r | g<<8 | b<<16`` — one in-kernel
    i32 store per pixel instead of three u8 lane-packing stores, and
    the caller recovers HWC u8 via :func:`unpack_rgb_hwc` (a bitcast +
    slice that also replaces the planar->HWC transpose pass). Kept
    OFF by default: it LOSES the same-window real-Mosaic A/B
    (benchmarks/exp_packed.py, config-2 shapes: packed 5.85 ms vs
    planar 5.19) — the i32 stores move 4 B/px where the planar path
    moves 3, and the minor-dim 4->3 bitcast/slice recovery relayout
    outweighs the saved 4:1 lane-packing casts. Bit-identical parity
    is pinned by tests/test_kernels.py::test_packed_out_parity.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kinds = tuple(IndexKind.parse(kd) for kd in kinds)
    if img_pl.ndim == 4:
        # batched: (B, C) per-frame bounds -> (B, 2, C) SMEM table
        bounds = jnp.stack(
            [lo.astype(jnp.float32), hi.astype(jnp.float32)], axis=1
        )
    else:
        bounds = jnp.stack([lo.astype(jnp.float32), hi.astype(jnp.float32)])
    if round0_kinds is not None:
        round0_kinds = tuple(bool(b) for b in round0_kinds)
        if len(round0_kinds) != len(kinds):
            raise ValueError(
                f"round0_kinds has {len(round0_kinds)} entries for "
                f"{len(kinds)} kinds"
            )
    if packed_out and render_mode not in ("dots", "planes", "planes2"):
        raise ValueError(
            "packed_out requires render_mode 'dots', 'planes' or 'planes2'"
        )
    if antipodal is not None:
        antipodal = tuple(
            None if p is None else int(p) for p in antipodal
        )
        if len(antipodal) != len(kinds):
            raise ValueError(
                f"antipodal has {len(antipodal)} entries for "
                f"{len(kinds)} kinds"
            )
        for k, p in enumerate(antipodal):
            if p is not None and not (0 <= p < k):
                raise ValueError(
                    f"antipodal[{k}]={p} must point at an earlier kind"
                )
    # Static no-padding proof: when the pixel count is an exact lane
    # AND block multiple and n_valid covers everything, the kernel
    # elides its positional mask and every where/multiply it feeds
    # (bitwise-identical outputs — the masked forms are exact
    # identities under an all-true mask). Resolve block_r HERE so the
    # rows-per-block condition is decidable before the jit boundary.
    n = int(img_pl.shape[-2]) * int(img_pl.shape[-1])
    if block_r is None:
        # Variant-keyed block choice — see the matching comment in
        # _fused_call (hist-on/off have different VMEM ceilings; the
        # hist-off sweep adopted 64, K>3 keeps the conservative
        # heuristic).
        if with_hist:
            block_r = auto_block_r(n, cap=32, kernel="fused_hist")
        elif len(kinds) <= 3:
            block_r = auto_block_r(n, cap=64, kernel="fused")
        else:
            block_r = auto_block_r(n, cap=32)
    nv_static = (
        n if n_valid is None
        else (int(n_valid) if isinstance(n_valid, (int, np.integer))
              else None)
    )
    all_valid = (
        nv_static == n and n % 1024 == 0 and (n // 1024) % block_r == 0
    )
    # pad_zero (static): the shape DOES carry tail padding, but the
    # wrapper zero-fills it, n_valid is statically everything, and every
    # coverage threshold is >= 0 — so the kernel elides its per-pixel
    # masks anyway and the wrapper subtracts the pads' statically-known
    # histogram/round-0 contributions (idx_pad == 0.0 exactly; see
    # _fused_kernel). PRECONDITION: ``lo >= 0`` per channel, which makes
    # the zero-byte pads white-balance to exactly 0 — true for all
    # histogram-percentile bounds of uint8 data. Enforcement: concrete
    # bounds are checked here; traced bounds are UNPROVABLE at trace
    # time, so the elision stays off unless the caller asserts the
    # precondition with ``bounds_nonneg=True`` (the pipeline callers
    # do — their bounds come from wb_bounds_from_histogram of uint8
    # data, always in [0, 255]). A traced negative lo would otherwise
    # white-balance the zero-byte pads to (0-lo)/span*255 > 0 and
    # silently corrupt sum/coverage/histogram/min.
    pad_zero = (
        not all_valid
        and nv_static == n
        and all(kd.coverage_threshold >= 0.0 for kd in kinds)
    )
    if pad_zero:
        if bounds_nonneg is not None:
            pad_zero = bool(bounds_nonneg)
        elif isinstance(lo, jax.core.Tracer):
            pad_zero = False  # unprovable precondition: keep the mask
        elif not bool(jnp.all(lo >= 0)):
            pad_zero = False  # custom negative bounds: keep the mask
    return _fused_call(
        img_pl, bounds, kinds, block_r, interpret, n_valid,
        with_renders=with_renders, with_round0=with_round0,
        with_hist=with_hist, render_mode=render_mode,
        round0_kinds=round0_kinds, packed_out=packed_out,
        round0_digit=round0_digit, antipodal=antipodal,
        all_valid=all_valid, with_idx_rows=with_idx_rows,
        pad_zero=pad_zero,
    )


def unpack_rgb_hwc(packed: jax.Array) -> jax.Array:
    """``(..., H, W) int32`` of ``r | g<<8 | b<<16`` -> ``(..., H, W, 3)``
    uint8 — a bitcast + slice (XLA fuses it into consumers; no
    transpose pass). Byte order is asserted by the packed_out parity
    tests on both CPU and real TPU."""
    b = jax.lax.bitcast_convert_type(packed, jnp.uint8)  # (..., H, W, 4)
    return b[..., :3]

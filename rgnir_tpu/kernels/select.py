"""Pallas radix-select: exact order statistics with in-VMEM byte histograms.

The jnp radix-select (rgnir_tpu.ops.select) is algorithmically right but
XLA materializes the 16-wide nibble one-hots in HBM — ~256 MB of
traffic per round for an 8 MPix batch. This kernel keeps them in VMEM:
each round reads the float32 values once, builds the order-preserving
uint32 key in-register (no separate key-materialization pass), masks
actives by comparing the high bits against the current per-batch prefix
(SMEM scalars), and contracts nibble one-hots on the MXU into a (16,16)
histogram per batch element. Batch rides the leading grid dimension
(vmap over pallas_call trips Mosaic layout checks in this jax version).

The round loop (4 rounds; cdf scan + byte pick on 256 values) stays in
jnp — it is O(256) work. Parity: bit-exact with ops.select
(tests/test_kernels.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rgnir_tpu.kernels.hist import auto_block_r
from rgnir_tpu.ops.select import f32_from_ordered_u32


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _no_padding(n_valid, rows: jax.Array) -> bool:
    """Static proof that the packed ``(B, R, 1024)`` rows hold no
    padding at all (n_valid is a plain int equal to R*1024): the
    kernels then elide their positional masks at trace time — exact,
    since the masked forms are identities under an all-true mask.
    Traced n_valid (sharded per-shard live counts) always returns
    False."""
    return (
        isinstance(n_valid, (int, np.integer))
        and int(n_valid) == int(rows.shape[-2]) * 1024
    )


def _ceil_to(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _byte_hist_kernel(
    vals_ref, prefix_ref, nvalid_ref, out_ref, *, shift: int, block_r: int,
    row_major_cols: Optional[int] = None, key_mode: str = "f32",
    all_valid: bool = False,
):
    # Note: with take_prefix, the grid batch index bi runs over the
    # SELECTED rows only; the vals BlockSpec index_map translates it to
    # the underlying (group-strided) input row, so this kernel body is
    # oblivious to the mapping.
    """Grid: (B, num_row_blocks). vals_ref: (1, block_r, 1024) float32 of
    one batch element (row-major flattened values; width 1024 mirrors
    the fused kernel's proven reshape-to-(1,n) layout). The
    order-preserving uint32 key is built HERE (~4 VPU ops) rather than
    materialized by a separate XLA pass — saves one full read+write of
    the data before the rounds. Padding is masked positionally against
    the SMEM ``nvalid_ref`` scalar (traced — per-shard dynamic row
    counts cost no recompiles), so the pad fill value is irrelevant.
    out_ref: (1, 16, 16) int32 accumulated."""
    bi = pl.program_id(0)
    step = pl.program_id(1)
    _, br, wc = vals_ref.shape
    n = br * wc

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    if key_mode == "q24":
        # 24-bit quantized order key for values in [-1, 1] whose
        # distinct members differ by > 2^-19 (pipeline index maps —
        # quotients of small ints; see masked_median_pallas
        # ``quantized``). floor((v+1) * 2^23) clipped to 2^24-1:
        # monotone (f32 rounding is monotone, power-of-two scaling
        # exact), and the top byte equals the fused kernel's render
        # byte i256, so round 0 reuses the render one-hots.
        x = (vals_ref[0] + jnp.float32(1.0)) * jnp.float32(8388608.0)
        keys = jnp.minimum(x.astype(jnp.int32), 2**24 - 1)
        top_shift = 16
    else:
        bits = jax.lax.bitcast_convert_type(vals_ref[0], jnp.uint32)
        keys = jnp.where(
            bits >> 31 == 1, ~bits, bits | jnp.uint32(0x80000000)
        )
        top_shift = 24
    prefix = prefix_ref[bi]  # whole (B,) SMEM array, indexed by batch
    if all_valid:
        # Static no-padding proof (n_valid == R*1024, see _byte_hist):
        # the positional mask is elided; rounds below the top byte
        # still restrict on the prefix match.
        in_bounds = None
    else:
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (br, wc), 0) * wc
            + jax.lax.broadcasted_iota(jnp.int32, (br, wc), 1)
            + step * n
        )
        if row_major_cols is None:
            in_bounds = pos < nvalid_ref[0]
        else:
            # 2-D shard validity: ``pos`` indexes the row-major
            # flattened (bh, bw) block; the static column divisor
            # lowers to a multiply-shift. nvalid_ref = [rows_live,
            # cols_live].
            row = pos // row_major_cols
            col = pos - row * row_major_cols
            in_bounds = (row < nvalid_ref[0]) & (col < nvalid_ref[1])

    def restrict(match):
        return match if in_bounds is None else (in_bounds & match)

    if key_mode == "q24":
        prefix = prefix.astype(jnp.int32)  # q24 keys fit i32
        if shift < top_shift:
            sh_hi = shift + 8
            active = restrict((keys >> sh_hi) == (prefix >> sh_hi))
        else:
            active = in_bounds
        byte = (keys >> shift) & 255
    elif shift < top_shift:
        sh_hi = jnp.uint32(shift + 8)
        active = restrict((keys >> sh_hi) == (prefix >> sh_hi))
        byte = (keys >> jnp.uint32(shift)).astype(jnp.int32) & 255
    else:
        active = in_bounds
        byte = (keys >> jnp.uint32(shift)).astype(jnp.int32) & 255
    # Fold the active mask into the VALUE (inactive -> 256, high nibble
    # 16 matches nothing): one select replaces a broadcast AND across
    # the 16 one-hot rows — measured 5-7x faster (benchmarks/exp_hist.py).
    if active is not None:
        byte = jnp.where(active, byte, 256)
    brow = byte.reshape(1, n)
    nib_col = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    oh_hi = jnp.where(
        (brow >> 4) == nib_col, jnp.float32(1), jnp.float32(0)
    )
    oh_lo = jnp.where((brow & 15) == nib_col, jnp.float32(1), jnp.float32(0))
    # int32 accumulation: per-block dot counts are exact in f32
    # (block < 2^24 elements) and the cross-block int32 sum stays exact
    # to 2^31 — an f32 accumulator would silently round once any bin
    # exceeds 2^24 (e.g. a constant 32 MPix mosaic).
    out_ref[0] += jax.lax.dot_general(
        oh_hi, oh_lo,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "shift", "block_r", "interpret", "row_major_cols", "take_prefix",
        "key_mode", "all_valid",
    ),
)
def _byte_hist(
    vals: jax.Array,    # (B, R, 1024) float32
    prefix: jax.Array,  # (Bsel,) uint32
    shift: int,
    n_valid,            # int / traced scalar, or [rows_live, cols_live]
    block_r: int,
    interpret: bool,
    row_major_cols: Optional[int] = None,
    take_prefix: Optional[Tuple[int, int]] = None,
    key_mode: str = "f32",
    all_valid: bool = False,
) -> jax.Array:
    """Per-row byte histograms; ``take_prefix=(group, take)`` views the
    B input rows as ``B//group`` groups and histograms only the first
    ``take`` rows of each group (Bsel = B//group*take) — the BlockSpec
    index_map does the group-strided row translation, so skipped rows'
    data is never fetched from HBM."""
    b, r, _ = vals.shape
    if take_prefix is not None:
        group, take = take_prefix
        assert b % group == 0 and 0 < take <= group, (b, take_prefix)
        b_sel = b // group * take
        vals_map = lambda bi, i: ((bi // take) * group + (bi % take), i, 0)
    else:
        b_sel = b
        vals_map = lambda bi, i: (bi, i, 0)
    grid = (b_sel, _cdiv(r, block_r))
    nv = jnp.asarray(n_valid, jnp.int32).reshape(-1)
    out = pl.pallas_call(
        functools.partial(
            _byte_hist_kernel, shift=shift, block_r=block_r,
            row_major_cols=row_major_cols, key_mode=key_mode,
            all_valid=all_valid,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_r, 1024), vals_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_sel,), lambda bi, i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((int(nv.shape[0]),), lambda bi, i: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, 16), lambda bi, i: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_sel, 16, 16), jnp.int32),
        interpret=interpret,
    )(vals, prefix, nv)
    return out.reshape(b_sel, 256)


def _q24_tail_kernel(
    vals_ref, kp_ref, mean_ref, nvalid_ref, out_ref, *, with_sumsq: bool,
    all_valid: bool = False,
):
    """One-read q24 select tail: recovery min (value of the winning
    24-bit bin), successor min (smallest value in any higher bin), and
    optionally the centered sum of squares for the two-pass variance.

    The XLA tail this replaces (quantize -> two masked min reductions
    [-> centered-square reduction]) compiled to multiple full data
    passes (measured 0.63 ms at config-2 shapes, benchmarks); this
    kernel does all three in ONE pass over the rows. Mins are
    order-independent, so the recovered median is bit-identical to the
    XLA tail; the sumsq accumulates per block (f32, ~1e-5 relative —
    same accuracy class as XLA's two-pass reduce, and far above the
    one-pass partials the pipeline rejected).

    Grid (Bsel, num_row_blocks); vals_ref (1, block_r, 1024) f32;
    kp_ref (Bsel,) int32 SMEM; mean_ref (Bsel,) f32 SMEM; out_ref
    (1, 1, 128) f32 with lanes 0=lo min, 1=successor min, 2=sumsq.
    """
    bi = pl.program_id(0)
    step = pl.program_id(1)
    _, br, wc = vals_ref.shape
    n = br * wc
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.where(lane < 2, jnp.inf, 0.0)

    v = vals_ref[0]
    # Same q24 key construction as _byte_hist_kernel; padding folds to
    # key -1 (< every bin, matches nothing). With the static
    # no-padding proof (all_valid) the positional mask is elided.
    kv = jnp.minimum(
        ((v + jnp.float32(1.0)) * jnp.float32(8388608.0)).astype(jnp.int32),
        2**24 - 1,
    )
    if all_valid:
        kvm = kv
    else:
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (br, wc), 0) * wc
            + jax.lax.broadcasted_iota(jnp.int32, (br, wc), 1)
            + step * n
        )
        in_b = pos < nvalid_ref[0]
        kvm = jnp.where(in_b, kv, -1)
    kp = kp_ref[bi]
    lo = jnp.min(jnp.where(kvm == kp, v, jnp.inf))
    nxt = jnp.min(jnp.where(kvm > kp, v, jnp.inf))
    old = out_ref[...]
    new = jnp.where(lane == 0, jnp.minimum(old, lo), old)
    new = jnp.where(lane == 1, jnp.minimum(old, nxt), new)
    if with_sumsq:
        c = v - mean_ref[bi] if all_valid else jnp.where(
            in_b, v - mean_ref[bi], jnp.float32(0.0)
        )
        new = jnp.where(lane == 2, old + jnp.sum(c * c), new)
    out_ref[...] = new


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_r", "interpret", "take_prefix", "with_sumsq", "all_valid",
    ),
)
def _q24_tail(
    vals: jax.Array,    # (B, R, 1024) float32
    kp: jax.Array,      # (Bsel,) int32 winning q24 keys
    mean: jax.Array,    # (Bsel,) float32 (zeros when with_sumsq=False)
    n_valid,
    block_r: int,
    interpret: bool,
    take_prefix: Optional[Tuple[int, int]] = None,
    with_sumsq: bool = False,
    all_valid: bool = False,
):
    """Returns (lo, nxt, sumsq) each (Bsel,); see _q24_tail_kernel."""
    b, r, _ = vals.shape
    if take_prefix is not None:
        group, take = take_prefix
        b_sel = b // group * take
        vals_map = lambda bi, i: ((bi // take) * group + (bi % take), i, 0)
    else:
        b_sel = b
        vals_map = lambda bi, i: (bi, i, 0)
    grid = (b_sel, _cdiv(r, block_r))
    nv = jnp.asarray(n_valid, jnp.int32).reshape(-1)
    out = pl.pallas_call(
        functools.partial(_q24_tail_kernel, with_sumsq=with_sumsq,
                          all_valid=all_valid),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_r, 1024), vals_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_sel,), lambda bi, i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b_sel,), lambda bi, i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((int(nv.shape[0]),), lambda bi, i: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 128), lambda bi, i: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_sel, 1, 128), jnp.float32),
        interpret=interpret,
    )(vals, kp, mean, nv)
    return out[:, 0, 0], out[:, 0, 1], out[:, 0, 2]


def _q24_onepass_kernel(
    vals_ref, sel0_ref, rank_ref, mean_ref, nvalid_ref, out_ref,
    vcache_ref, hist_ref, *,
    num_data_steps: int, with_sumsq: bool, all_valid: bool = False,
):
    """ONE-pass q24 select: radix rounds 1-2 + the recovery/successor/
    variance tail in a single kernel, reading the data from HBM once.

    The 3-pass path (`_select_batched` q24 + `_q24_tail`) re-reads the
    full f32 values from HBM for round 1, round 2, and the tail. Here
    the grid's data steps 0..R-1 stream each row block ONCE: the block
    is folded into the round-1 byte histogram (restricted to the
    round-0 winner ``sel0``, picked in XLA from the fused kernel's
    free round-0 histogram) AND copied into a VMEM cache. The final
    grid step then runs entirely from VMEM: round-1 cdf pick, round-2
    histogram over cache chunks, round-2 pick, and the tail loop — so
    rounds 2 and 3 cost VMEM bandwidth, not HBM.

    The in-kernel cdf pick avoids dynamic indexing (no Mosaic gather):
    the 256-bin histogram lives as (16{hi}, 16{lo}); an inclusive
    within-row cumsum dot (16,16 upper-triangular) plus a strict
    row-prefix dot gives the byte-ordered cdf, and the winning byte /
    count-below / count-in-bin come from masked sums against an iota
    bin index — the same arithmetic `_select_batched` does in XLA,
    ~1k flops per pick.

    Grid (Bsel, num_data_steps + 1). vals_ref (1, block_r, 1024) f32
    (the final step's BlockSpec repeats the last block index: no
    refetch). sel0/rank (Bsel,) i32 SMEM: round-0 winning byte and the
    rank REMAINING after round 0. mean_ref (Bsel,) f32 SMEM. out_ref
    (1, 1, 128) f32, lanes 0=recovery min, 1=successor min, 2=centered
    sumsq, 3=count(key==winner)-rank (the even-n eq_minus_rank, exact
    in f32: counts < 2^24). Scratch: vcache (R*block_r, 1024) f32,
    hist (16, 16) f32 (block counts exact in f32; totals < 2^24 by the
    caller's cache-size gate).
    """
    bi = pl.program_id(0)
    step = pl.program_id(1)
    _, br, wc = vals_ref.shape
    n = br * wc
    sel0 = sel0_ref[bi]
    nv = nvalid_ref[0]
    nib_col = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)

    def q24_keys(v, base_pos):
        # Same key construction as _byte_hist_kernel / _q24_tail_kernel;
        # all_valid (static no-padding proof) elides the position mask.
        kv = jnp.minimum(
            ((v + jnp.float32(1.0)) * jnp.float32(8388608.0)
             ).astype(jnp.int32),
            2 ** 24 - 1,
        )
        if all_valid:
            return kv, None
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) * wc
            + jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
            + base_pos
        )
        return kv, pos < nv

    def restrict(match, in_b):
        return match if in_b is None else (in_b & match)

    def hist16(byte, m):
        # (br, wc) int32 in [0, 256] -> (16, 16) f32 bin counts
        # (inactive byte 256 has hi nibble 16: matches nothing).
        brow = byte.reshape(1, m)
        oh_hi = jnp.where(
            (brow >> 4) == nib_col, jnp.float32(1), jnp.float32(0)
        )
        oh_lo = jnp.where(
            (brow & 15) == nib_col, jnp.float32(1), jnp.float32(0)
        )
        return jax.lax.dot_general(
            oh_hi, oh_lo,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(step == 0)
    def _():
        hist_ref[...] = jnp.zeros_like(hist_ref)

    @pl.when(step < num_data_steps)
    def _():
        v = vals_ref[0]
        vcache_ref[pl.ds(step * br, br), :] = v
        kv, in_b = q24_keys(v, step * n)
        active = restrict((kv >> 16) == sel0, in_b)
        byte1 = jnp.where(active, (kv >> 8) & 255, 256)
        hist_ref[...] += hist16(byte1, n)

    @pl.when(step == num_data_steps)
    def _():
        row_i = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
        incl = jnp.where(row_i <= col_i, jnp.float32(1), jnp.float32(0))
        strict = jnp.where(col_i < row_i, jnp.float32(1), jnp.float32(0))
        bidx = row_i * 16 + col_i

        def pick(h, rk):
            # Byte-ordered cdf of the (16{hi}, 16{lo}) histogram:
            # inclusive cumsum within each hi row + strict sum of
            # earlier rows. Returns (winning byte, remaining rank,
            # count inside the winning bin) — mirrors _select_batched.
            # Precision.HIGHEST is REQUIRED: unlike the one-hot/byte
            # LUT dots (operands bf16-exact by construction), these
            # dots carry bin COUNTS up to n — Mosaic's default 1-pass
            # bf16 matmul truncates them (observed: cdf off by 2 at
            # counts ~1156, picking a neighboring bin). The 6-pass
            # decomposition is exact for f32 and costs nothing at
            # (16, 16) scale.
            rc = jax.lax.dot_general(
                h, incl, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            rowsum = rc[:, 15:16]
            below_rows = jax.lax.dot_general(
                strict, rowsum,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            cdf = rc + below_rows
            rkf = rk.astype(jnp.float32)
            sel = jnp.sum(
                (cdf <= rkf).astype(jnp.float32)
            ).astype(jnp.int32)
            below = jnp.sum(
                jnp.where(bidx == sel - 1, cdf, jnp.float32(0))
            )
            inbin = jnp.sum(
                jnp.where(bidx == sel, cdf, jnp.float32(0))
            ) - below
            return sel, rk - below.astype(jnp.int32), inbin

        sel1, rk2, _ = pick(hist_ref[...], rank_ref[bi])
        p12 = sel0 * 256 + sel1

        def body2(c, acc):
            v = vcache_ref[pl.ds(c * br, br), :]
            kv, in_b = q24_keys(v, c * n)
            active = restrict((kv >> 8) == p12, in_b)
            byte2 = jnp.where(active, kv & 255, 256)
            return acc + hist16(byte2, n)

        h2 = jax.lax.fori_loop(
            0, num_data_steps, body2, jnp.zeros((16, 16), jnp.float32)
        )
        sel2, rk3, inbin2 = pick(h2, rk2)
        eqmr = inbin2 - rk3.astype(jnp.float32)
        kp = p12 * 256 + sel2

        def body3(c, carry):
            lo, nxt, ss = carry
            v = vcache_ref[pl.ds(c * br, br), :]
            kv, in_b = q24_keys(v, c * n)
            kvm = kv if in_b is None else jnp.where(in_b, kv, -1)
            lo = jnp.minimum(
                lo, jnp.min(jnp.where(kvm == kp, v, jnp.inf))
            )
            nxt = jnp.minimum(
                nxt, jnp.min(jnp.where(kvm > kp, v, jnp.inf))
            )
            if with_sumsq:
                cv = (
                    v - mean_ref[bi] if in_b is None
                    else jnp.where(in_b, v - mean_ref[bi], jnp.float32(0))
                )
                ss = ss + jnp.sum(cv * cv)
            return lo, nxt, ss

        lo, nxt, ss = jax.lax.fori_loop(
            0, num_data_steps, body3,
            (jnp.float32(jnp.inf), jnp.float32(jnp.inf), jnp.float32(0)),
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
        out = jnp.where(lane == 0, lo, jnp.float32(0))
        out = jnp.where(lane == 1, nxt, out)
        out = jnp.where(lane == 2, ss, out)
        out = jnp.where(lane == 3, eqmr, out)
        out_ref[...] = out


# One-pass cache budget: the whole per-batch-element value array must
# sit in VMEM scratch next to the streamed block + one-hot temporaries
# (~16 MB/core total). 4 MB covers images up to ~1 MPix (config-2/1
# shapes); larger inputs fall back to the 3-pass path.
Q24_ONEPASS_MAX_CACHE_BYTES = 4 << 20


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_r", "interpret", "take_prefix", "with_sumsq", "all_valid",
    ),
)
def _q24_onepass(
    vals: jax.Array,    # (B, R, 1024) float32
    sel0: jax.Array,    # (Bsel,) int32 round-0 winning byte
    rank1: jax.Array,   # (Bsel,) int32 rank remaining after round 0
    mean: jax.Array,    # (Bsel,) float32 (zeros when with_sumsq=False)
    n_valid,
    block_r: int,
    interpret: bool,
    take_prefix: Optional[Tuple[int, int]] = None,
    with_sumsq: bool = False,
    all_valid: bool = False,
):
    """Returns (lo, nxt, sumsq, eq_minus_rank) each (Bsel,); see
    _q24_onepass_kernel."""
    b, r, _ = vals.shape
    steps = _cdiv(r, block_r)
    if take_prefix is not None:
        group, take = take_prefix
        b_sel = b // group * take
        in_row = lambda bi: (bi // take) * group + (bi % take)
    else:
        b_sel = b
        in_row = lambda bi: bi
    vals_map = lambda bi, i: (in_row(bi), jnp.minimum(i, steps - 1), 0)
    grid = (b_sel, steps + 1)
    nv = jnp.asarray(n_valid, jnp.int32).reshape(-1)
    out = pl.pallas_call(
        functools.partial(
            _q24_onepass_kernel, num_data_steps=steps,
            with_sumsq=with_sumsq, all_valid=all_valid,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_r, 1024), vals_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_sel,), lambda bi, i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b_sel,), lambda bi, i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b_sel,), lambda bi, i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((int(nv.shape[0]),), lambda bi, i: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 128), lambda bi, i: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_sel, 1, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((steps * block_r, 1024), jnp.float32),
            pltpu.VMEM((16, 16), jnp.float32),
        ],
        interpret=interpret,
    )(vals, sel0, rank1, mean, nv)
    return out[:, 0, 0], out[:, 0, 1], out[:, 0, 2], out[:, 0, 3]


def _round0_pick(r0_hist: jax.Array, rank: jax.Array):
    """XLA cdf pick over the fused kernel's free (Bsel, 256) round-0
    histogram: returns (winning byte, rank remaining inside the bin) —
    the same O(256) arithmetic as one _select_batched round."""
    cdf = jnp.cumsum(r0_hist, axis=-1)
    sel = jnp.sum((cdf <= rank[:, None]).astype(jnp.int32), axis=-1)
    below = jnp.take_along_axis(
        cdf, jnp.maximum(sel - 1, 0)[:, None], axis=-1
    )[:, 0]
    below = jnp.where(sel > 0, below, 0)
    return sel, rank - below


def _select_batched(
    vals: jax.Array,  # (B, R, 1024) float32, padding masked by n_valid
    rank: jax.Array,  # (Bsel,) int32
    n_valid: int,
    block_r: int,
    interpret: bool,
    round0_hist: Optional[jax.Array] = None,
    take_prefix: Optional[Tuple[int, int]] = None,
    key_mode: str = "f32",
):
    """Radix rounds; returns (key (Bsel,), eq_minus_rank (Bsel,)).

    ``key_mode="f32"``: 4 byte rounds over the order-preserving uint32
    bit key (exact for any non-NaN f32; the final key IS the value).
    ``key_mode="q24"``: 3 byte rounds over the 24-bit quantized key
    (see _byte_hist_kernel) — one fewer data pass, but the caller must
    recover the value from the winning bin and guarantee the key
    separates distinct values (masked_median_pallas ``quantized``).

    ``round0_hist``: optional precomputed (Bsel, 256) int32 histogram
    of the TOP key byte over the valid values (what the fused kernel
    emits with ``with_round0``; for q24 that byte equals the render
    byte i256) — round 0 then costs no data pass at all, only the
    O(256) cdf scan.

    ``take_prefix=(group, take)``: select only the first ``take`` rows
    of each ``group`` consecutive input rows (see _byte_hist); rank and
    round0_hist are already Bsel-sized.
    """
    b = vals.shape[0]
    if take_prefix is not None:
        b = b // take_prefix[0] * take_prefix[1]
    prefix = jnp.zeros((b,), jnp.uint32)
    rk = jnp.asarray(rank, jnp.int32)
    eq_minus_rank = None
    all_valid = _no_padding(n_valid, vals)
    shifts = (24, 16, 8, 0) if key_mode == "f32" else (16, 8, 0)
    for shift in shifts:
        if shift == shifts[0] and round0_hist is not None:
            hist = round0_hist
        else:
            hist = _byte_hist(
                vals, prefix, shift, n_valid, block_r, interpret,
                take_prefix=take_prefix, key_mode=key_mode,
                all_valid=all_valid,
            )
        cdf = jnp.cumsum(hist, axis=-1)  # (B, 256)
        sel = jnp.sum((cdf <= rk[:, None]).astype(jnp.int32), axis=-1)
        below = jnp.take_along_axis(
            cdf, jnp.maximum(sel - 1, 0)[:, None], axis=-1
        )[:, 0]
        below = jnp.where(sel > 0, below, 0)
        in_bin = jnp.take_along_axis(
            cdf, jnp.minimum(sel, 255)[:, None], axis=-1
        )[:, 0] - below
        rk = rk - below
        prefix = prefix | (sel.astype(jnp.uint32) << jnp.uint32(shift))
        eq_minus_rank = in_bin - rk
    return prefix, eq_minus_rank


def _pack_rows(vals_flat: jax.Array, block_r):
    """(B, N) f32 -> (B, R, 1024) row-flattened values (zero tail pad;
    the kernel masks padding positionally, so the fill never counts)."""
    b, n = vals_flat.shape
    rows = _ceil_to(_cdiv(n, 1024), block_r)
    if rows * 1024 > 2**31 - 1:
        raise ValueError(
            f"{n} elements ({rows * 1024} padded) exceed the int32 "
            "positional range of the radix-select kernel (2^31-1); use "
            "the sharded path (rgnir_tpu.parallel.analyze_mosaic)."
        )
    pad = rows * 1024 - n
    vals = jnp.pad(vals_flat, ((0, 0), (0, pad)))
    return vals.reshape(b, rows, 1024)


def radix_order_statistic_pallas(
    vals: jax.Array,
    rank: jax.Array,
    reduce_ndim: int = 1,
    block_r=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Exact rank-th smallest float32 over the last ``reduce_ndim`` axes;
    leading dims batch. (Dense path, no mask — for masked/distributed
    selection use ops.select.)"""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    batch = vals.shape[: vals.ndim - reduce_ndim]
    n = 1
    for d in vals.shape[vals.ndim - reduce_ndim:]:
        n *= d
    if block_r is None:
        block_r = auto_block_r(n, kernel="select")
    flat = vals.reshape((-1, n)).astype(jnp.float32)
    rows = _pack_rows(flat, block_r)
    rank_b = jnp.broadcast_to(jnp.asarray(rank, jnp.int32), batch).reshape(-1)
    key, _ = _select_batched(rows, rank_b, n, block_r, interpret)
    return f32_from_ordered_u32(key).reshape(batch)


def masked_median_pallas(
    vals: jax.Array,
    n_valid: int,
    reduce_ndim: int = 1,
    block_r=None,
    interpret: Optional[bool] = None,
    round0_hist: Optional[jax.Array] = None,
    take_prefix: Optional[Tuple[int, int]] = None,
    quantized: bool = False,
    means: Optional[jax.Array] = None,
    onepass: Optional[bool] = None,
) -> jax.Array:
    """Exact median (numpy even-n semantics) via the kernel radix-select.

    Even n uses the adjacent-rank fast path: one 4-round select plus a
    single min over values strictly greater than the selected one
    (float order == key order on non-NaN data), taken over the unpadded
    input so no key array is ever materialized.

    ``round0_hist``: optional int32 top-byte key histogram emitted by
    the fused kernel (``with_round0``) — skips round 0's full data
    pass; with ``take_prefix`` its batch shape is the SELECTED batch.

    ``take_prefix=(group, take)``: the flattened batch is viewed as
    groups of ``group`` consecutive elements and medians are computed
    only for the first ``take`` of each (the antipodal-kind plan of
    kernels/pipeline: a derived kind's median is the exact negation of
    its partner's, so its radix rounds and successor pass are skipped
    — skipped rows are never read from HBM). Returns shape
    ``batch[:-1] + (take,)`` (the last batch dim must equal ``group``).

    ``quantized``: select over the 24-bit quantized key
    ``min(floor((v+1)*2^23), 2^24-1)`` instead of the f32 bit key —
    one fewer radix data pass, and the recovery min merges with the
    even-n successor pass (value + successor in ONE read).
    ``onepass=True`` (requires ``round0_hist`` and values within the
    ``Q24_ONEPASS_MAX_CACHE_BYTES`` VMEM budget) collapses the whole
    select to ONE data pass — rounds 1-2 and the tail run from a
    VMEM-resident copy with in-kernel cdf picks
    (``_q24_onepass_kernel``). Bit-identical to the 3-pass path but
    measured 0.3-0.9% SLOWER same-window (issue-bound passes hide the
    saved reads), so the 3-pass path is the default. EXACT only
    when every pair of distinct values differs by more than 2^-19 and
    values lie in [-1, 1] with no NaNs. That holds for every pipeline
    index map: indices are clip((a-b)/(a+b+1e-10)) with integer bands
    in [0, 255], whose distinct computed values differ by at least
    1/510^2 - 2^-23 > 2^-19 (exhaustively verified over all 65536
    band pairs in tests/test_kernels.py). ``round0_hist`` must then be
    the i256 render-byte histogram (fused kernel round0_digit="q24").

    ``means`` (quantized only): optional per-selected-batch means,
    shaped like the returned medians — the tail kernel then ALSO
    accumulates the centered sum of squares in its single data pass
    (the pipeline's two-pass variance, without its own pass) and the
    return becomes ``(median, centered_sumsq)``.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    batch = vals.shape[: vals.ndim - reduce_ndim]
    n = 1
    for d in vals.shape[vals.ndim - reduce_ndim:]:
        n *= d
    assert n == n_valid, (n, n_valid)
    if block_r is None:
        block_r = auto_block_r(n, kernel="select")
    flat = vals.reshape((-1, n)).astype(jnp.float32)
    rows = _pack_rows(flat, block_r)
    b = rows.shape[0]
    if take_prefix is not None:
        group, take = take_prefix
        if not batch or batch[-1] != group:
            raise ValueError(
                f"take_prefix group {group} must equal the last batch "
                f"dim, got batch {batch}"
            )
        b = b // group * take
        out_batch = batch[:-1] + (take,)
        # Successor/flat reads below see only selected rows; the slice
        # fuses into its consumer (no (Bsel, n) copy materializes).
        flat = flat.reshape(-1, group, n)[:, :take].reshape(b, n)
    else:
        out_batch = batch
    rank = jnp.full((b,), (n_valid - 1) // 2, jnp.int32)
    r0 = None if round0_hist is None else round0_hist.reshape(-1, 256)
    if means is not None and not quantized:
        raise ValueError("means= requires quantized=True")
    if quantized:
        with_ss = means is not None
        mean_b = (
            means.reshape(-1).astype(jnp.float32) if with_ss
            else jnp.zeros((b,), jnp.float32)
        )
        # ``onepass=True`` selects the one-pass kernel explicitly; the
        # DEFAULT is the 3-pass path — the honest interleaved A/B
        # (benchmarks/exp_onepass.py, select_onepass as a STATIC jit
        # arg; never A/B via trace-time globals, the first version of
        # the harness did and silently measured one executable twice)
        # had the 3-pass side 0.3-0.9% faster in both measured windows:
        # the passes are issue-bound, so the saved HBM reads were
        # already hidden while the HIGHEST-precision in-kernel picks
        # and the serialized final step cost a little extra.
        use_onepass = bool(onepass) if onepass is not None else False
        if use_onepass:
            if r0 is None:
                raise ValueError("onepass=True requires round0_hist")
            cache_bytes = _ceil_to(rows.shape[1], block_r) * 1024 * 4
            if cache_bytes > Q24_ONEPASS_MAX_CACHE_BYTES:
                raise ValueError(
                    f"onepass=True: {cache_bytes} B exceeds the VMEM "
                    f"cache budget {Q24_ONEPASS_MAX_CACHE_BYTES}"
                )
        if use_onepass:
            # ONE-pass path: rounds 1-2 + the tail run from a VMEM
            # cache of the values — one HBM read instead of three
            # (_q24_onepass_kernel). Round 0 is the free fused-kernel
            # histogram, picked here in XLA.
            sel0, rank1 = _round0_pick(r0, rank)
            lo, nxt, sumsq, eq_minus_rank = _q24_onepass(
                rows, sel0, rank1, mean_b, n_valid, block_r, interpret,
                take_prefix=take_prefix, with_sumsq=with_ss,
                all_valid=_no_padding(n_valid, rows),
            )
            eq_minus_rank = eq_minus_rank.astype(jnp.int32)
        else:
            # Key separation (see docstring) makes the winning bin hold
            # ONE distinct value: the tail kernel recovers it, the
            # (even n) successor, and (with ``means``) the centered sum
            # of squares in ONE data pass (_q24_tail_kernel; the XLA
            # tail it replaced compiled to multiple passes — 0.63 ms at
            # config-2 shapes).
            key_q, eq_minus_rank = _select_batched(
                rows, rank, n_valid, block_r, interpret, round0_hist=r0,
                take_prefix=take_prefix, key_mode="q24",
            )
            lo, nxt, sumsq = _q24_tail(
                rows, key_q.astype(jnp.int32), mean_b, n_valid, block_r,
                interpret, take_prefix=take_prefix, with_sumsq=with_ss,
                all_valid=_no_padding(n_valid, rows),
            )
        if n_valid % 2 == 1:
            med = lo
        else:
            hi = jnp.where(eq_minus_rank >= 2, lo, nxt)
            med = (lo + hi) * 0.5
        med = med.reshape(out_batch)
        if with_ss:
            return med, sumsq.reshape(out_batch)
        return med
    key_lo, eq_minus_rank = _select_batched(
        rows, rank, n_valid, block_r, interpret, round0_hist=r0,
        take_prefix=take_prefix,
    )
    lo = f32_from_ordered_u32(key_lo)
    if n_valid % 2 == 1:
        return lo.reshape(out_batch)
    # Successor in float domain (key order == float order on non-NaN
    # data): min of values strictly greater than lo over the UNPADDED
    # flat array — no key materialization needed.
    nxt = jnp.min(
        jnp.where(flat > lo[:, None], flat, jnp.inf), axis=1
    )
    hi = jnp.where(eq_minus_rank >= 2, lo, nxt)
    return ((lo + hi) * 0.5).reshape(out_batch)


def masked_median_pallas_rows(
    rows: jax.Array,     # (B, R, 1024) f32, per-element tail padding
    n_valid: int,
    take: Optional[int] = None,
    block_r=None,
    interpret: Optional[bool] = None,
    round0_hist: Optional[jax.Array] = None,
    means: Optional[jax.Array] = None,
    onepass: Optional[bool] = None,
):
    """Quantized-key median over PRE-PACKED kernel rows.

    The fused kernel's ``with_idx_rows`` output is already in the
    select's ``(B, R, 1024)`` row layout (same row-major flattening,
    same zero tail fill, block-aligned R) — this entry consumes it
    directly, skipping :func:`masked_median_pallas`'s reshape + repad
    pass (a full read+write of the index maps for shapes whose pixel
    count is not row-block aligned, e.g. 1080p frames).

    ``take``: compute medians only for the first ``take`` of the B
    elements (the antipodal-kind plan with KIND-MAJOR rows — canonical
    kinds first; skipped rows are never fetched from HBM).
    ``round0_hist`` ``(take, 256) int32`` and ``means`` ``(take,)`` as
    in :func:`masked_median_pallas` (quantized semantics and exactness
    precondition identical — index-map-like values only). Returns
    ``median (take,)`` or ``(median, centered_sumsq)`` with ``means``.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, r, lanes = rows.shape
    assert lanes == 1024, rows.shape
    assert n_valid <= r * 1024, (n_valid, rows.shape)
    if block_r is None:
        block_r = auto_block_r(n_valid, kernel="select")
    if not (r % block_r == 0 and (block_r % 8 == 0 or block_r == r)):
        # rows are pre-packed: the block must divide R exactly (the
        # BlockSpec grid covers R in block_r steps), AND Mosaic
        # requires the sublane block dim be a multiple of 8 or equal
        # to R itself (verified on real TPU: (., 10, 1024) and
        # (., 81, 1024) blocks are rejected at lowering). Fall back to
        # the largest multiple-of-8 divisor not above the preferred
        # block, or R itself when none exists (e.g. odd R).
        block_r = next(
            (d for d in range(min(block_r, r) // 8 * 8, 0, -8)
             if r % d == 0),
            r,
        )
    b_sel = b if take is None else int(take)
    take_prefix = None if b_sel == b else (b, b_sel)
    rank = jnp.full((b_sel,), (n_valid - 1) // 2, jnp.int32)
    r0 = None if round0_hist is None else round0_hist.reshape(-1, 256)
    with_ss = means is not None
    mean_b = (
        means.reshape(-1).astype(jnp.float32) if with_ss
        else jnp.zeros((b_sel,), jnp.float32)
    )
    all_valid = _no_padding(n_valid, rows)
    if onepass:
        if r0 is None:
            raise ValueError("onepass=True requires round0_hist")
        cache_bytes = r * 1024 * 4
        if cache_bytes > Q24_ONEPASS_MAX_CACHE_BYTES:
            raise ValueError(
                f"onepass=True: {cache_bytes} B exceeds the VMEM "
                f"cache budget {Q24_ONEPASS_MAX_CACHE_BYTES}"
            )
        sel0, rank1 = _round0_pick(r0, rank)
        lo, nxt, sumsq, eq_minus_rank = _q24_onepass(
            rows, sel0, rank1, mean_b, n_valid, block_r, interpret,
            take_prefix=take_prefix, with_sumsq=with_ss,
            all_valid=all_valid,
        )
        eq_minus_rank = eq_minus_rank.astype(jnp.int32)
    else:
        key_q, eq_minus_rank = _select_batched(
            rows, rank, n_valid, block_r, interpret, round0_hist=r0,
            take_prefix=take_prefix, key_mode="q24",
        )
        lo, nxt, sumsq = _q24_tail(
            rows, key_q.astype(jnp.int32), mean_b, n_valid, block_r,
            interpret, take_prefix=take_prefix, with_sumsq=with_ss,
            all_valid=all_valid,
        )
    if n_valid % 2 == 1:
        med = lo
    else:
        hi = jnp.where(eq_minus_rank >= 2, lo, nxt)
        med = (lo + hi) * 0.5
    if with_ss:
        return med, sumsq
    return med


def masked_median_pallas_sharded(
    vals: jax.Array,
    n_valid_global: int,
    n_live: Optional[jax.Array],
    axis_name,
    block_r=None,
    interpret: Optional[bool] = None,
    live_rc: Optional[tuple] = None,
    quantized: bool = False,
    round0_hist: Optional[jax.Array] = None,
) -> jax.Array:
    """Distributed exact median with Pallas per-round byte histograms.

    The shard_map production path: each round runs the VMEM-key byte
    histogram kernel on the local shard and ``psum``s its 256 ints over
    ``axis_name`` — identical communication to the jnp distributed
    radix (ops.select.masked_median) but ~3x less local work (no key
    materialization, mask folded into the compared value; measured
    7.9 ms -> Pallas-path cost on a 4096^2 shard body, config 6).

    Validity is positional. Two layouts:

    - prefix (``n_live``): the first ``n_live`` elements of the
      row-major flattened local shard are real (full-width row-block
      shards),
    - rectangular (``live_rc=(rows_live, cols_live)``): the shard is a
      2-D ``(bh, bw)`` block whose top-left ``rows_live x cols_live``
      rectangle is real (row AND column padding on 2-D meshes); the
      kernel recovers (row, col) from the flat position with a static
      divide by ``bw``.

    Args:
      vals: local shard, any shape (reduced in full), float32.
      n_valid_global: static global count of valid elements.
      n_live: traced local count of valid leading elements (prefix
        layout; pass None with ``live_rc``).
      axis_name: mesh axis name (or tuple) to reduce over.
      live_rc: traced ``(rows_live, cols_live)`` for the rectangular
        layout; ``vals`` must then be 2-D ``(bh, bw)``.
      quantized: radix over the 24-bit quantized key instead of the
        f32 bit key — 3 rounds instead of 4 (2 with ``round0_hist``),
        and the recovery min merges with the even-n successor. Same
        exactness precondition as ``masked_median_pallas(quantized=
        True)``: values in [-1, 1], distinct values > 2^-19 apart
        (all pipeline index maps; NOT index DIFFS — parallel/change.py
        stays on the f32 path).
      round0_hist: (256,) or (1, 256) int32 GLOBAL (already psum'd)
        top-byte histogram for the first round — the fused kernel's
        ``round0_digit="q24"`` output — skipping that round's data
        pass and collective entirely.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_local = 1
    for d in vals.shape:
        n_local *= d
    if block_r is None:
        block_r = auto_block_r(n_local, kernel="select")
    flat = vals.reshape(1, n_local).astype(jnp.float32)
    rows = _pack_rows(flat, block_r)
    if live_rc is not None:
        if vals.ndim != 2:
            raise ValueError("live_rc requires a (bh, bw) 2-D shard")
        row_major_cols = int(vals.shape[1])
        nv = jnp.stack(
            [jnp.asarray(x, jnp.int32) for x in live_rc]
        )
    else:
        row_major_cols = None
        nv = jnp.asarray(n_live, jnp.int32)

    prefix = jnp.zeros((1,), jnp.uint32)
    rk = jnp.full((1,), (n_valid_global - 1) // 2, jnp.int32)
    eq_minus_rank = None
    key_mode = "q24" if quantized else "f32"
    shifts = (16, 8, 0) if quantized else (24, 16, 8, 0)
    for shift in shifts:
        if shift == shifts[0] and round0_hist is not None:
            # caller supplies the GLOBAL (already psum'd) top-byte
            # histogram, e.g. the fused kernel's i256 round-0 output
            hist = round0_hist.reshape(1, 256)
        else:
            hist = _byte_hist(rows, prefix, shift, nv, block_r, interpret,
                              row_major_cols=row_major_cols,
                              key_mode=key_mode)
            hist = jax.lax.psum(hist, axis_name)  # (1, 256) global counts
        cdf = jnp.cumsum(hist, axis=-1)
        sel = jnp.sum((cdf <= rk[:, None]).astype(jnp.int32), axis=-1)
        below = jnp.take_along_axis(
            cdf, jnp.maximum(sel - 1, 0)[:, None], axis=-1
        )[:, 0]
        below = jnp.where(sel > 0, below, 0)
        in_bin = jnp.take_along_axis(
            cdf, jnp.minimum(sel, 255)[:, None], axis=-1
        )[:, 0] - below
        rk = rk - below
        prefix = prefix | (sel.astype(jnp.uint32) << jnp.uint32(shift))
        eq_minus_rank = in_bin - rk
    pos = jnp.arange(n_local, dtype=jnp.int32)
    if live_rc is not None:
        prow = pos // row_major_cols
        pcol = pos - prow * row_major_cols
        pos_valid = (prow < nv[0]) & (pcol < nv[1])
    else:
        pos_valid = pos < nv
    if quantized:
        # Key separation (masked_median_pallas ``quantized``) makes the
        # winning 24-bit bin hold one distinct value: recover it — and
        # the even-n successor — with local masked mins + pmin, one
        # data read total (vs the f32 path's free value + one read).
        # NOTE: unlike the batched pipeline (which routes this tail
        # through _q24_tail_kernel and measured +0.35 ms), here the
        # whole shard body lives in ONE jit, XLA fuses these mins with
        # the adjacent round/stat passes, and a same-day A/B of the
        # kernel-tail variant measured no improvement (4.07 vs
        # 3.97-4.23 ms window band on config 6) — kept on XLA.
        kp = prefix.astype(jnp.int32)[0]
        kv = jnp.minimum(
            ((flat[0] + 1.0) * jnp.float32(2**23)).astype(jnp.int32),
            2**24 - 1,
        )
        lo = jax.lax.pmin(
            jnp.min(jnp.where((kv == kp) & pos_valid, flat[0], jnp.inf)),
            axis_name,
        )
        if n_valid_global % 2 == 1:
            return lo
        nxt = jax.lax.pmin(
            jnp.min(jnp.where((kv > kp) & pos_valid, flat[0], jnp.inf)),
            axis_name,
        )
        hi = jnp.where(eq_minus_rank[0] >= 2, lo, nxt)
        return (lo + hi) * 0.5
    lo = f32_from_ordered_u32(prefix)[0]
    if n_valid_global % 2 == 1:
        return lo
    # Even n: global successor of lo — local masked min of values
    # strictly greater, then pmin (float order == key order, non-NaN).
    nxt = jnp.min(
        jnp.where((flat[0] > lo) & pos_valid, flat[0], jnp.inf)
    )
    nxt = jax.lax.pmin(nxt, axis_name)
    hi = jnp.where(eq_minus_rank[0] >= 2, lo, nxt)
    return (lo + hi) * 0.5

"""Is a Mosaic dot's cost per-OP (fixed overhead) or per-ROW (operand
staging)? Decides whether stacking the fused kernel's per-kind dots
into one block-diagonal dot can cut the render section's 73% share
(benchmarks/exp_fusedsect.py).

Two matched pairs, each pair computing IDENTICAL math with the same
total operand/output rows, differing only in dot count:

  render_sep   3 dots:  lut_k (16,48) ^T-contracted with oh_k (16,n)
               -> 3 x (48,n) planes                     [production]
  render_stk   1 dot :  blockdiag lut (144,48) @ OH (48,n) -> (144,n)

  r0_sep       2 dots:  oh_hi_k (16,n) @ oh_lo_k^T -> 2 x (16,16)
  r0_stk       1 dot :  OH_hi (32,n) @ OH_lo^T -> (32,32)
               (2x the MACs — off-diagonal blocks are discarded — but
               MACs are free at 7% MXU; only staging/overhead counts)

All kernels build their one-hots in-kernel from a streamed f32 index
block (the production build path), consume every dot output with the
same plane-sum + multiply-reduce shape, and run at block_r=16 so the
stacked (144,n) intermediate fits VMEM. chain_time_ab interleaving;
per-variant ms is the whole kernel, so compare WITHIN a pair only.

Usage: python benchmarks/exp_dotstack.py [batch] [size]
"""

from __future__ import annotations

import functools
import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

from rgnir_tpu.utils.microbench import chain_time_ab  # noqa: E402

K = 3
BLOCK_R = 16
LANES = 1024


def _onehot16(v, nib_col):
    return jnp.where(v == nib_col, jnp.float32(1), jnp.float32(0))


def _i256(idx, n):
    q = jnp.minimum(
        jnp.floor((idx + 1.0) * jnp.float32(128.0)).astype(jnp.int32), 255
    )
    return q.reshape(1, n)


def _onehot16b(v, nib_col):
    # direct i1->bf16 select fails Mosaic relayout ((8,128) mask tiling
    # vs (16,128) bf16 tiling); go through f32 and downcast
    return _onehot16(v, nib_col).astype(jnp.bfloat16)


def _render_kernel(idx_ref, lut_ref, out_ref, *, stacked: bool,
                   bf16: bool = False):
    br, wc = idx_ref.shape[1], idx_ref.shape[2]
    n = br * wc
    nib = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    oh = _onehot16b if bf16 else _onehot16
    i256 = [_i256(idx_ref[k], n) for k in range(K)]
    oh_hi = [oh(i256[k] >> 4, nib) for k in range(K)]
    oh_lo = [
        _onehot16(i256[k] & 15, nib) for k in range(K)
    ]  # lo feeds a VPU multiply-reduce vs f32 cand — keep f32
    if stacked:
        oh = jnp.concatenate(oh_hi, axis=0)  # (48, n)
        planes = jax.lax.dot_general(
            lut_ref[...], oh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (144, n): rows [48k, 48k+48) = kind k's byte planes
        cands = [
            planes[48 * k:48 * k + 16]
            + planes[48 * k + 16:48 * k + 32]
            + planes[48 * k + 32:48 * k + 48]
            for k in range(K)
        ]
    else:
        cands = []
        for k in range(K):
            blk = lut_ref[k * 48:k * 48 + 48, k * 16:k * 16 + 16]
            if bf16:
                # byte*2^k entries are <= 8 mantissa bits: bf16-exact
                blk = blk.astype(jnp.bfloat16)
            candT = jax.lax.dot_general(
                blk, oh_hi[k],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (48, n)
            cands.append(candT[0:16] + candT[16:32] + candT[32:48])
    for k in range(K):
        val = jnp.sum(oh_lo[k] * cands[k], axis=0, keepdims=True)
        out_ref[k] = val.reshape(br, wc).astype(jnp.int32)


def _r0_kernel(idx_ref, out_ref, *, stacked: bool, nc: int = 2,
               bf16: bool = False):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    br, wc = idx_ref.shape[1], idx_ref.shape[2]
    n = br * wc
    nib = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    oh = _onehot16b if bf16 else _onehot16
    i256 = [_i256(idx_ref[k], n) for k in range(nc)]
    oh_hi = [oh(i256[k] >> 4, nib) for k in range(nc)]
    oh_lo = [oh(i256[k] & 15, nib) for k in range(nc)]
    if stacked:
        hi = jnp.concatenate(oh_hi, axis=0)  # (32, n)
        lo = jnp.concatenate(oh_lo, axis=0)
        big = jax.lax.dot_general(
            hi, lo,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (32, 32); diag blocks are the per-kind histograms
        for k in range(nc):
            out_ref[k] += (
                big[16 * k:16 * k + 16, 16 * k:16 * k + 16]
                .astype(jnp.int32)
            )
    else:
        for k in range(nc):
            out_ref[k] += jax.lax.dot_general(
                oh_hi[k], oh_lo[k],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)


def main() -> None:
    from rgnir_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    n = size * size
    rows = batch * n // LANES
    grid = (rows // BLOCK_R,)

    rng = np.random.default_rng(0)
    idx = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (K, rows, LANES)).astype(np.float32)
    ))
    # block-diagonal (144, 48) byte-plane LUT; the separate variant
    # slices its own kind's (48, 16) block back out
    lut = np.zeros((144, 48), np.float32)
    for k in range(K):
        lut[48 * k:48 * k + 48, 16 * k:16 * k + 16] = rng.integers(
            0, 256, (48, 16)
        ).astype(np.float32) * np.repeat([65536.0, 256.0, 1.0], 16)[:, None]
    lut = jax.device_put(jnp.asarray(lut))

    def render(stacked, bf16=False):
        kern = functools.partial(_render_kernel, stacked=stacked, bf16=bf16)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((K, BLOCK_R, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((144, 48), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K, BLOCK_R, LANES), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, rows, LANES), jnp.int32),
        )

    def r0(stacked, bf16=False):
        kern = functools.partial(_r0_kernel, stacked=stacked, bf16=bf16)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((K, BLOCK_R, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, 16, 16), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, 16, 16), jnp.int32),
        )

    # Loop-carried data dependence (else XLA hoists the pallas_call out
    # of the fori_loop as loop-invariant): xor the output's low bit into
    # the input's mantissa LSB — value drift ~1e-7, bin distribution and
    # kernel cost unchanged, constant 2 VPU ops/element across variants.
    def body_render(stacked, bf16=False):
        call = render(stacked, bf16)
        def go(i, carry):
            x, acc = carry
            out = call(x, lut)
            xi = jax.lax.bitcast_convert_type(x, jnp.int32)
            nxt = jax.lax.bitcast_convert_type(xi ^ (out & 1), jnp.float32)
            return nxt, acc + jnp.sum(out[:, :1, :1].astype(jnp.float32))
        return go

    def body_r0(stacked, bf16=False):
        call = r0(stacked, bf16)
        def go(i, carry):
            x, acc = carry
            out = call(x)
            xi = jax.lax.bitcast_convert_type(x, jnp.int32)
            upd = xi[:2, :16, :16] ^ (out & 1)
            nxt = jax.lax.bitcast_convert_type(
                xi.at[:2, :16, :16].set(upd), jnp.float32
            )
            return nxt, acc + jnp.sum(out.astype(jnp.float32))
        return go

    # correctness gates: stacked == separate == bf16, bitwise
    np.testing.assert_array_equal(
        np.asarray(render(True)(idx, lut)),
        np.asarray(render(False)(idx, lut)),
    )
    np.testing.assert_array_equal(
        np.asarray(render(False, True)(idx, lut)),
        np.asarray(render(False)(idx, lut)),
    )
    np.testing.assert_array_equal(
        np.asarray(r0(True)(idx)), np.asarray(r0(False)(idx))
    )
    np.testing.assert_array_equal(
        np.asarray(r0(False, True)(idx)), np.asarray(r0(False)(idx))
    )

    res = chain_time_ab(
        {
            "render_sep": body_render(False),
            "render_stk": body_render(True),
            "render_bf16": body_render(False, True),
            "r0_sep": body_r0(False),
            "r0_stk": body_r0(True),
            "r0_bf16": body_r0(False, True),
        },
        (idx, jnp.zeros(())), ns=(10, 60), reps=6,
    )
    mpix = batch * n / 1e6
    print(json.dumps(
        {k: {"ms": round(v, 3), "mpix_s": round(mpix / v * 1e3, 1)}
         for k, v in res.items()},
        indent=1,
    ))


if __name__ == "__main__":
    main()

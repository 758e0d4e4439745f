"""Probe + A/B for the packed-LUT render path (config-2 fused-kernel
VPU-cost reduction).

The render section builds two 16-row one-hots, runs THREE (16,16)x(16,n)
MXU dots (one per channel) and three 16-row multiply-reduces. Two
candidate optimizations:

1. **Packed LUT dot**: pack (r,g,b) bytes into one f32 as
   r*65536 + g*256 + b (< 2^24, f32-exact) and contract ONCE with
   ``precision=HIGHEST`` (exact iff Mosaic honors the 3-pass f32
   decomposition for 24-bit-int operands against a 0/1 one-hot).
2. **Binary select tree** for the lo-nibble gather: 15 broadcast
   selects instead of a 16-row multiply-reduce (31 ops).

Part 1 verifies exactness of both on REAL Mosaic (bit parity against
the per-channel reference). Part 2 A/Bs full config-2-shaped fused
bodies (same-window interleaved slopes).

Usage: python benchmarks/exp_render.py [probe|ab]
"""

from __future__ import annotations

import functools
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))


def _probe_kernel(i256_ref, lutpack_ref, out_ref, *, mode: str):
    """i256_ref (1, n) int32 in [0,255]; lutpack_ref (16,16) f32 24-bit
    ints; out_ref (1, n) f32 = lutpack[hi, lo] gathered per column."""
    i256 = i256_ref[...]
    n = i256.shape[-1]
    nib_col = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    hi = i256 >> 4
    lo = i256 & 15
    oh_hi = jnp.where(hi == nib_col, jnp.float32(1), jnp.float32(0))
    # candT[l, i] = lutpack[hi_i, l]
    candT = jax.lax.dot_general(
        lutpack_ref[...], oh_hi,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (16, n)
    if mode == "mulreduce":
        oh_lo = jnp.where(lo == nib_col, jnp.float32(1), jnp.float32(0))
        val = jnp.sum(oh_lo * candT, axis=0, keepdims=True)
    else:  # select tree over the lo nibble
        t = candT
        for bit in (3, 2, 1, 0):
            half = t.shape[0] // 2
            cond = (lo & (1 << bit)) != 0  # (1, n)
            t = jnp.where(cond, t[half:], t[:half])
        val = t  # (1, n)
    out_ref[...] = val


def probe() -> None:
    from rgnir_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    n = 2048
    i256 = rng.integers(0, 256, (1, n), dtype=np.int32)
    lut = rng.integers(0, 256, (16, 16, 3), dtype=np.int64)
    lutpack = (
        lut[..., 0] * 65536 + lut[..., 1] * 256 + lut[..., 2]
    ).astype(np.float32)
    want = lutpack[i256[0] >> 4, i256[0] & 15][None, :]

    for mode in ("mulreduce", "tree"):
        out = pl.pallas_call(
            functools.partial(_probe_kernel, mode=mode),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(i256), jnp.asarray(lutpack))
        got = np.asarray(out)
        ok = np.array_equal(got, want)
        print(f"{mode}: exact={ok}"
              + ("" if ok else f" maxerr={np.abs(got-want).max()}"))


def ab() -> None:
    from rgnir_tpu.kernels.fused import fused_analyze_pallas
    from rgnir_tpu.utils.compile_cache import enable_persistent_cache
    from rgnir_tpu.utils.microbench import chain_time_ab

    enable_persistent_cache()
    kinds = ("NDVI", "GNDVI", "NDWI")
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (32, 3, 512, 512), dtype=np.uint8)
    ))
    lo = jnp.full((32, 3), 10.0, jnp.float32)
    hi = jnp.full((32, 3), 240.0, jnp.float32)

    def body(render_mode):
        def go(i, carry):
            im, acc = carry
            out = jax.vmap(
                lambda p, l, h: fused_analyze_pallas(
                    p, l, h, kinds, with_renders=True, with_round0=True,
                    with_hist=False, render_mode=render_mode,
                )
            )(im, lo, hi)
            nxt = out[0] ^ out[2][:, 0]
            return nxt, acc + jnp.sum(out[3][..., 0])
        return go

    res = chain_time_ab(
        {"dots": body("dots"), "packed": body("packed"),
         "tree": body("tree"), "packed_mr": body("packed_mr"),
         "planes": body("planes"), "planes2": body("planes2")},
        (img, jnp.zeros(())), ns=(10, 60), reps=6,
    )
    print({k: round(v, 3) for k, v in res.items()})


def sections() -> None:
    """Same-window cost of each fused-kernel section at config-2 shape
    (32 x 512^2, K=3, hist off): base = WB+idx+stats; +r0 adds the
    round-0 select histogram; +renders adds the colormap section."""
    from rgnir_tpu.kernels.fused import fused_analyze_pallas
    from rgnir_tpu.utils.compile_cache import enable_persistent_cache
    from rgnir_tpu.utils.microbench import chain_time_ab

    enable_persistent_cache()
    kinds = ("NDVI", "GNDVI", "NDWI")
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (32, 3, 512, 512), dtype=np.uint8)
    ))
    lo = jnp.full((32, 3), 10.0, jnp.float32)
    hi = jnp.full((32, 3), 240.0, jnp.float32)

    def body(renders, r0):
        def go(i, carry):
            im, acc = carry
            out = jax.vmap(
                lambda p, l, h: fused_analyze_pallas(
                    p, l, h, kinds, with_renders=renders,
                    with_round0=r0, with_hist=False,
                )
            )(im, lo, hi)
            nxt = (out[0] ^ out[2][:, 0]) if renders else out[0]
            return nxt, acc + jnp.sum(out[3][..., 0])
        return go

    res = chain_time_ab(
        {
            "base": body(False, False),
            "base_r0": body(False, True),
            "full": body(True, True),
        },
        (img, jnp.zeros(())), ns=(10, 60), reps=6,
    )
    out = {k: round(v, 3) for k, v in res.items()}
    out["r0_cost"] = round(res["base_r0"] - res["base"], 3)
    out["render_cost"] = round(res["full"] - res["base_r0"], 3)
    print(out)


def blocks() -> None:
    """block_r sweep for the hist-off fused body (the autotuned winner
    16 was measured at the with-hist worst-case VMEM footprint; without
    the (64, n) ge matrix bigger blocks may pipeline better)."""
    from rgnir_tpu.kernels.fused import fused_analyze_pallas
    from rgnir_tpu.utils.compile_cache import enable_persistent_cache
    from rgnir_tpu.utils.microbench import chain_time_ab

    enable_persistent_cache()
    kinds = ("NDVI", "GNDVI", "NDWI")
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (32, 3, 512, 512), dtype=np.uint8)
    ))
    lo = jnp.full((32, 3), 10.0, jnp.float32)
    hi = jnp.full((32, 3), 240.0, jnp.float32)

    def body(block_r):
        def go(i, carry):
            im, acc = carry
            out = jax.vmap(
                lambda p, l, h: fused_analyze_pallas(
                    p, l, h, kinds, with_renders=True, with_round0=True,
                    with_hist=False, block_r=block_r,
                )
            )(im, lo, hi)
            nxt = out[0] ^ out[2][:, 0]
            return nxt, acc + jnp.sum(out[3][..., 0])
        return go

    res = chain_time_ab(
        {f"br{b}": body(b) for b in (16, 32, 64)},
        (img, jnp.zeros(())), ns=(10, 60), reps=6,
    )
    print({k: round(v, 3) for k, v in res.items()})


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "ab":
        ab()
    elif len(sys.argv) > 1 and sys.argv[1] == "sections":
        sections()
    elif len(sys.argv) > 1 and sys.argv[1] == "blocks":
        blocks()
    else:
        probe()

"""Achievable-bandwidth probe: pure stream Pallas kernels vs the spec.

Answers the roofline table's open question — every config implies only
~20% of the 819 GB/s HBM spec, so is that a kernel defect or the
ceiling Pallas/Mosaic actually reaches on this chip? Three kernels:

  copy_f32   read 4 B + write 4 B per element (y = x + 1)
  read_f32   read 4 B, write 1/1024 (row sums) — read-dominated
  u8_widen   read 1 B u8, widen via i32 (the fused kernel's input
             idiom), write 4 B f32

Each is slope-timed (chained, carry-dependent) at a config-2-sized
array; prints implied GB/s against the 819 GB/s spec. Findings feed
BENCHMARKS.md's roofline section.

Usage: python benchmarks/exp_stream.py [block_r ...]
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


def _copy_kernel(x_ref, y_ref):
    y_ref[...] = x_ref[...] + jnp.float32(1.0)


def _read_kernel(x_ref, y_ref):
    y_ref[...] = jnp.sum(x_ref[...], axis=-1, keepdims=True)


def _sublane_kernel(x_ref, y_ref):
    # axis-0 (sublane) reduce: rows fold by vector adds, no cross-lane.
    # Output block is (8, 1024) — Mosaic requires sublane-divisible-8
    # blocks — so the (1, 1024) row is broadcast into it.
    r = jnp.sum(x_ref[...], axis=0, keepdims=True)
    y_ref[...] = jnp.broadcast_to(r, y_ref.shape)


def _scalar_kernel(x_ref, y_ref):
    # full reduce to one scalar, composed into an (8, 128) block store —
    # the fused kernel's stats idiom (jnp.sum(idx * validf) etc.)
    s = jnp.sum(x_ref[...])
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    y_ref[...] = jnp.where(lane == 0, s, 0.0)


def _widen_kernel(x_ref, y_ref):
    y_ref[...] = x_ref[...].astype(jnp.int32).astype(jnp.float32)


def _stats5_scalar_kernel(x_ref, y_ref):
    # the fused kernel's stats section verbatim: five full reductions
    # to scalars, composed into one lane-masked row store
    x = x_ref[...]
    s1 = jnp.sum(x)
    s2 = jnp.sum(x * x)
    s3 = jnp.min(x)
    s4 = jnp.max(x)
    s5 = jnp.sum((x > jnp.float32(0.2)).astype(jnp.float32))
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row = jnp.where(lane == 0, s1, 0.0)
    row = jnp.where(lane == 1, s2, row)
    row = jnp.where(lane == 2, s3, row)
    row = jnp.where(lane == 3, s4, row)
    row = jnp.where(lane == 4, s5, row)
    y_ref[...] = row


def _stats5_sublane_kernel(x_ref, y_ref):
    # same five statistics but reduced only across sublanes (axis 0),
    # storing five (1, 1024) partial rows — the lane reduction is
    # deferred to one final pass (in production: the last grid step)
    x = x_ref[...]
    r1 = jnp.sum(x, axis=0, keepdims=True)
    r2 = jnp.sum(x * x, axis=0, keepdims=True)
    r3 = jnp.min(x, axis=0, keepdims=True)
    r4 = jnp.max(x, axis=0, keepdims=True)
    r5 = jnp.sum((x > jnp.float32(0.2)).astype(jnp.float32), axis=0,
                 keepdims=True)
    pad = jnp.zeros((3, x.shape[1]), jnp.float32)
    y_ref[...] = jnp.concatenate([r1, r2, r3, r4, r5, pad], axis=0)


def main() -> None:
    from rgnir_tpu.utils.compile_cache import enable_persistent_cache
    from rgnir_tpu.utils.microbench import chain_time_ab

    enable_persistent_cache()
    # one block size by default: each (kernel, block_r, n) cell is a
    # separate minutes-slow tunnel compile; pass more sizes explicitly
    block_rs = [int(a) for a in sys.argv[1:]] or [128]
    rows = 24576  # 24576 x 1024 f32 = 96 MiB (config-2 scale)
    rng = np.random.default_rng(0)
    xf = jax.device_put(jnp.asarray(
        rng.normal(size=(rows, 1024)).astype(np.float32)
    ))
    xu = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (rows, 1024), dtype=np.uint8)
    ))

    def call(kernel, x, block_r, out_block, out_cols, out_dtype,
             per_block_out):
        nblocks = rows // block_r
        out_rows = nblocks * out_block[0] if per_block_out else rows
        return pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec((block_r, 1024), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(out_block, lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((out_rows, out_cols), out_dtype),
        )(x)

    bodies = {}
    for br in block_rs:
        def mk(name, kernel, u8=False, out_block=None, out_cols=1024,
               out_dtype=jnp.float32, per_block_out=False, _br=br):
            ob = out_block or (_br, out_cols)

            def go(i, carry):
                a, b, acc = carry
                src = b if u8 else a
                y = call(kernel, src, _br, ob, out_cols, out_dtype,
                         per_block_out)
                # carry depends on the output so nothing hoists
                if u8:
                    return a, b ^ y[:, :1024].astype(jnp.uint8), acc
                if per_block_out:
                    return a + y[:1, :1], b, acc + jnp.sum(y[0])
                if out_cols == 1024:
                    return y, b, acc
                return a + y, b, acc + jnp.sum(y[0])
            bodies[f"{name}_br{_br}"] = go
        mk("copy", _copy_kernel)
        mk("read", _read_kernel, out_cols=1)
        mk("widen", _widen_kernel, u8=True)
        mk("sublane", _sublane_kernel, out_block=(8, 1024),
           per_block_out=True)
        mk("scalar", _scalar_kernel, out_block=(8, 128), out_cols=128,
           per_block_out=True)
        mk("stats5scalar", _stats5_scalar_kernel, out_block=(8, 128),
           out_cols=128, per_block_out=True)
        mk("stats5sublane", _stats5_sublane_kernel, out_block=(8, 1024),
           per_block_out=True)

    res = chain_time_ab(
        bodies, (xf, xu, jnp.zeros(())), ns=(10, 40), reps=5,
    )
    nbytes = {"copy": rows * 1024 * 8, "read": rows * 1024 * 4,
              "widen": rows * 1024 * 5, "sublane": rows * 1024 * 4,
              "scalar": rows * 1024 * 4, "stats5scalar": rows * 1024 * 4,
              "stats5sublane": rows * 1024 * 4}
    out = {}
    for k, ms in res.items():
        base = k.split("_")[0]
        out[k] = {"ms": round(ms, 3),
                  "gb_s": round(nbytes[base] / ms / 1e6, 1),
                  "pct_819": round(nbytes[base] / ms / 1e6 / 819 * 100, 1)}
    print(out)


if __name__ == "__main__":
    main()

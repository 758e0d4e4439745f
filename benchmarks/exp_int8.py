"""int8 one-hot / ge-matrix experiments (ROADMAP item 2).

Compares MXU dtype strategies for the three histogram-shaped
contractions in the hot kernels, with correctness gates and
INTERLEAVED A/B timing (chain_time_ab — cross-run absolutes are
meaningless on this shared chip):

1. 256-bin channel histogram: (16,n)x(16,n)^T nibble one-hots.
   Variants: f32 (production), int8 direct, int8 via f32 astype.
2. radix-select byte histogram (shift=24 round): same shape over
   float32-derived keys. Variants: f32 (production), int8.
3. fused kernel's 50-bin cumulative: (1,n)x(64,n)^T ge-matrix.
   Variants: bf16 dot (production), int8 dot, f32 lane-sum.

Mosaic's int8 min tile is (32,128); our one-hot operands are 16- or
64-sublane — this script is the empirical test of whether that layout
lowers and wins. Usage: python benchmarks/exp_int8.py
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
sys.path.insert(0, str(_ROOT / "tools"))
from tpu_microbench import chain_time_ab  # noqa: E402

from rgnir_tpu.kernels.hist import _LANES, flatten_to_rows  # noqa: E402

BATCH, SIZE = 32, 512
N = SIZE * SIZE
BLOCK_R = 32


def _onehots(vrow, nib_col, dtype):
    hi_eq = (vrow >> 4) == nib_col
    lo_eq = (vrow & 15) == nib_col
    if dtype == "f32":
        mk = lambda eq: jnp.where(eq, jnp.float32(1), jnp.float32(0))  # noqa: E731
        pref = jnp.float32
    elif dtype == "i8":
        mk = lambda eq: jnp.where(eq, jnp.int8(1), jnp.int8(0))  # noqa: E731
        pref = jnp.int32
    elif dtype == "i8_via_f32":
        mk = lambda eq: jnp.where(  # noqa: E731
            eq, jnp.float32(1), jnp.float32(0)
        ).astype(jnp.int8)
        pref = jnp.int32
    else:
        raise ValueError(dtype)
    return mk(hi_eq), mk(lo_eq), pref


# ---------------------------------------------------------------- group 1
def _hist_kernel_v(img_ref, out_ref, *, dtype: str):
    step = pl.program_id(0)
    c, br, wc = img_ref.shape
    n = br * wc

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    nib_col = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    for ch in range(c):
        vrow = img_ref[ch].astype(jnp.int32).reshape(1, n)
        oh_hi, oh_lo, pref = _onehots(vrow, nib_col, dtype)
        h2 = jax.lax.dot_general(
            oh_hi, oh_lo,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=pref,
        )
        out_ref[ch] += h2.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("dtype",))
def hist_v(img_pl, dtype: str):
    c = img_pl.shape[0]
    flat = flatten_to_rows(img_pl, BLOCK_R)
    rows = flat.shape[-2]
    out = pl.pallas_call(
        functools.partial(_hist_kernel_v, dtype=dtype),
        grid=(rows // BLOCK_R,),
        in_specs=[pl.BlockSpec((c, BLOCK_R, _LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, 16, 16), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 16, 16), jnp.float32),
    )(flat)
    return out.reshape(c, 256).astype(jnp.int32)


# ---------------------------------------------------------------- group 2
def _byte_kernel_v(vals_ref, out_ref, *, dtype: str):
    step = pl.program_id(1)
    _, br, wc = vals_ref.shape
    n = br * wc

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    bits = jax.lax.bitcast_convert_type(vals_ref[0], jnp.uint32)
    keys = jnp.where(bits >> 31 == 1, ~bits, bits | jnp.uint32(0x80000000))
    byte = (keys >> jnp.uint32(24)).astype(jnp.int32)
    brow = byte.reshape(1, n)
    nib_col = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    oh_hi, oh_lo, pref = _onehots(brow, nib_col, dtype)
    out_ref[0] += jax.lax.dot_general(
        oh_hi, oh_lo,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=pref,
    ).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("dtype",))
def byte_v(vals, dtype: str):
    b, r, _ = vals.shape
    out = pl.pallas_call(
        functools.partial(_byte_kernel_v, dtype=dtype),
        grid=(b, r // BLOCK_R),
        in_specs=[pl.BlockSpec((1, BLOCK_R, 1024), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 16, 16), lambda bi, i: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 16, 16), jnp.float32),
    )(vals)
    return out.reshape(b, 256).astype(jnp.int32)


# ---------------------------------------------------------------- group 3
def _ge_kernel_v(idx_ref, edges_ref, out_ref, *, dtype: str):
    step = pl.program_id(0)
    br, wc = idx_ref.shape
    n = br * wc

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    idx_row = idx_ref[...].reshape(1, n)
    edges_col = jnp.concatenate(
        [edges_ref[j].reshape(1, 1) for j in range(51)]
        + [jnp.full((13, 1), jnp.inf, jnp.float32)],
        axis=0,
    )
    ge_b = idx_row >= edges_col  # (64, n) i1
    if dtype == "bf16":
        ge = jnp.where(ge_b, jnp.float32(1), jnp.float32(0)).astype(
            jnp.bfloat16
        )
        cum = jax.lax.dot_general(
            jnp.ones((1, n), jnp.bfloat16), ge,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    elif dtype == "i8":
        ge = jnp.where(ge_b, jnp.int8(1), jnp.int8(0))
        cum = jax.lax.dot_general(
            jnp.ones((1, n), jnp.int8), ge,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    elif dtype == "f32_sum":
        ge = jnp.where(ge_b, jnp.float32(1), jnp.float32(0))
        cum = jnp.sum(ge, axis=1).reshape(1, 64)
    else:
        raise ValueError(dtype)
    out_ref[...] += cum.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("dtype",))
def ge_v(idx_flat, edges, dtype: str):
    r = idx_flat.shape[0]
    out = pl.pallas_call(
        functools.partial(_ge_kernel_v, dtype=dtype),
        grid=(r // BLOCK_R,),
        in_specs=[
            pl.BlockSpec((BLOCK_R, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 64), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 64), jnp.float32),
    )(idx_flat, edges)
    return out


def main() -> None:
    from rgnir_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.default_rng(0)
    imgs = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (BATCH, SIZE, SIZE, 3), dtype=np.uint8)
    ))
    mpix = BATCH * N / 1e6

    # ---- group 1: 256-bin channel histogram -----------------------------
    def hist_body(dtype):
        def body(i, c):
            h = jax.vmap(lambda x: hist_v(x, dtype))(jnp.moveaxis(c, -1, -3))
            return c ^ h[:, 0, 0].astype(jnp.uint8)[..., None, None, None]
        return body

    pl_imgs = jnp.moveaxis(imgs, -1, -3)
    ref = jax.vmap(lambda x: hist_v(x, "f32"))(pl_imgs)
    bodies = {"hist_f32": hist_body("f32")}
    for d in ("i8", "i8_via_f32"):
        try:
            got = jax.vmap(lambda x, _d=d: hist_v(x, _d))(pl_imgs)
            if bool(jnp.array_equal(got, ref)):
                bodies[f"hist_{d}"] = hist_body(d)
            else:
                print(json.dumps({"variant": f"hist_{d}",
                                  "CORRECTNESS": "FAIL"}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": f"hist_{d}",
                              "error": f"{type(e).__name__}: {e}"[:160]}),
                  flush=True)
    res = chain_time_ab(bodies, imgs, ns=(10, 60), reps=6)
    for k, ms in res.items():
        print(json.dumps({"variant": k, "ms": round(ms, 3),
                          "mpix_per_s": round(mpix / ms * 1e3, 1)}),
              flush=True)

    # ---- group 2: select byte histogram ---------------------------------
    vals = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (BATCH, N // 1024, 1024)).astype(np.float32)
    ))

    def byte_body(dtype):
        def body(i, c):
            h = byte_v(c, dtype)
            return c + (h[:, 0].astype(jnp.float32) * 0.0)[:, None, None]
        return body

    refb = byte_v(vals, "f32")
    bodies = {"byte_f32": byte_body("f32")}
    try:
        if bool(jnp.array_equal(byte_v(vals, "i8"), refb)):
            bodies["byte_i8"] = byte_body("i8")
        else:
            print(json.dumps({"variant": "byte_i8",
                              "CORRECTNESS": "FAIL"}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": "byte_i8",
                          "error": f"{type(e).__name__}: {e}"[:160]}),
              flush=True)
    res = chain_time_ab(bodies, vals, ns=(10, 60), reps=6)
    for k, ms in res.items():
        print(json.dumps({"variant": k, "ms": round(ms, 3),
                          "mpix_per_s": round(mpix / ms * 1e3, 1)}),
              flush=True)

    # ---- group 3: 50-bin cumulative ge-matrix ----------------------------
    edges = jnp.asarray(np.concatenate(
        [np.linspace(-1.0, 1.0, 51).astype(np.float32),
         np.full(13, np.inf, np.float32)]
    ))
    idx_flat = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (BATCH * N // 1024, 1024)).astype(np.float32)
    ))

    def ge_body(dtype):
        def body(i, c):
            out = ge_v(c, edges, dtype)
            return c + (out[0, 0] * 0.0)
        return body

    refg = ge_v(idx_flat, edges, "bf16")
    bodies = {"ge_bf16": ge_body("bf16")}
    for d in ("i8", "f32_sum"):
        try:
            if bool(jnp.array_equal(ge_v(idx_flat, edges, d), refg)):
                bodies[f"ge_{d}"] = ge_body(d)
            else:
                print(json.dumps({"variant": f"ge_{d}",
                                  "CORRECTNESS": "FAIL"}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": f"ge_{d}",
                              "error": f"{type(e).__name__}: {e}"[:160]}),
                  flush=True)
    res = chain_time_ab(bodies, idx_flat, ns=(10, 60), reps=6)
    for k, ms in res.items():
        print(json.dumps({"variant": k, "ms": round(ms, 3),
                          "mpix_per_s": round(mpix / ms * 1e3, 1)}),
              flush=True)


if __name__ == "__main__":
    main()

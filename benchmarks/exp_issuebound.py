"""Empirical Mosaic dependent-op issue-rate ceiling (round-4 verdict
item 5: "bound or break config 2").

The roofline table (BENCHMARKS.md) says config 2 runs at ~1.0 T VPU
ops/s — 14% of the 7.2 T elementwise peak, 28% of half-peak — and
attributes the gap to the dependent-op issue rate inside the Mosaic
pipeline. This script MEASURES that ceiling directly: a stripped Pallas
kernel whose body is nothing but a chain of K serially-dependent f32
vector ops on a (block_r, 1024) tile (a 4-op rotation of multiply-add /
max / add / min with varying constants so nothing folds), one HBM read
of config 2's pixel volume in, one scalar checksum per block out. No
stats, no renders, no select — just issue slots.

The per-op cost comes from the SLOPE between two K values (subtracts
the read/convert/checksum overhead the same way the bench's chained
loops subtract dispatch):

    ceiling_tops = pixels * (k2 - k1) / (t(k2) - t(k1))

and the implied bound for config 2 (497 modeled VPU ops/px) is
``ceiling_tops / 497`` GPix/s.

FINDINGS (2026-08-20, BENCHMARKS.md "Config 2 bounded by measurement"):
chain SoL is ~4.1 Tops/s at block_r=32 with a register-residency cliff
past block_r=64 (a (128,1024) f32 tile spills; every chain op then
round-trips VMEM); the i32 mix issues within ~10% of f32; bf16 issues
SLOWER than f32 (no 2x packing — dead lever). Config 2's select runs
at ~51% of this SoL, its fused kernel at ~19% (structural: MXU/VPU
interleave, narrow one-hot tiles, stat reductions, live-tile spills).

Usage: python benchmarks/exp_issuebound.py [block_r] [f32|int|bf16]
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

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

_LANES = 1024


def _chain_kernel(img_ref, out_ref, *, k: int, mix: str = "f32"):
    """K serially-dependent elementwise ops on the block.

    ``mix="f32"``: a 4-op rotation (fma, max-vs-source, add,
    min-vs-const) with a different constant every step so no algebraic
    folding can shorten the chain; `max(a, v * s)` keeps the source
    tile live, mirroring the fused kernel's shape (index maps keep wb
    channels live).

    ``mix="int"``: the one-hot/nibble section's op diet — i32 shift,
    and-mask, add, compare+select — to measure whether integer lanes
    issue at a different rate than f32 (the fused kernel's render and
    histogram sections are mostly this mix).
    """
    # Mosaic lacks direct u8<->f32 casts; hop through int32.
    vi = img_ref[...].astype(jnp.int32)
    steps = max(k // 4, 1)
    if mix == "int":
        b = vi
        for i in range(steps):
            b = b + np.int32(3 + (i % 5))
            b = (b >> np.int32(1 + (i % 3)))
            b = b & np.int32(0xFF >> (i % 2))
            b = jnp.where(b > np.int32(i % 16), b, vi)
        a = b.astype(jnp.float32)
    elif mix == "bf16":
        # Same rotation as f32 but in bf16: if Mosaic packs two bf16
        # per 32-bit lane, this chain runs ~2x the f32 rate and the
        # kernel's one-hot/render sections (bf16-exact by construction)
        # have a big lever; if it matches f32, the lever is dead.
        v = vi.astype(jnp.float32).astype(jnp.bfloat16)
        a = v * jnp.bfloat16(1.0 / 255.0)
        for i in range(steps):
            a = a * jnp.bfloat16(1.0 + (i % 7) * 1e-3) + jnp.bfloat16(0.125)
            a = jnp.maximum(a, v * jnp.bfloat16(1e-3 * (i % 5 + 1)))
            a = a + jnp.bfloat16(0.25 + (i % 3) * 1e-2)
            a = jnp.minimum(a, jnp.bfloat16(255.0 + i))
        a = a.astype(jnp.float32)
    else:
        v = vi.astype(jnp.float32)
        a = v * np.float32(1.0 / 255.0)
        for i in range(steps):
            c = np.float32(1.0 + (i % 7) * 1e-3)
            d = np.float32(0.125 + (i % 11) * 1e-3)
            a = a * c + d
            a = jnp.maximum(a, v * np.float32(1e-3 * (i % 5 + 1)))
            a = a + np.float32(0.25 + (i % 3) * 1e-2)
            a = jnp.minimum(a, np.float32(255.0 + i))
    # Accumulated checksum (min vector-register-shaped block — scalar
    # broadcast over (8, 128); any element carries the value).
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] = out_ref[...] + jnp.sum(a)


@functools.partial(jax.jit, static_argnames=("k", "block_r", "mix"))
def chain_pass(flat: jax.Array, k: int, block_r: int = 256,
               mix: str = "f32") -> jax.Array:
    """flat: (R, 1024) uint8. Returns an (8, 128) accumulated checksum."""
    rows = flat.shape[0]
    grid = (rows // block_r,)
    return pl.pallas_call(
        functools.partial(_chain_kernel, k=k, mix=mix),
        grid=grid,
        in_specs=[pl.BlockSpec((block_r, _LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(flat)


def measure(ks=(64, 256), reps: int = 6, block_r: int = 256,
            mix: str = "f32") -> dict:
    import os

    from rgnir_tpu.utils.compile_cache import (
        enable_persistent_cache, machine_local_cache_dir,
    )
    from rgnir_tpu.utils.microbench import chain_time_ab

    # One-off sweep kernels must not pollute the repo-committed cache
    # (threshold-0 persistence): default to the per-user experiment dir.
    if os.environ.get("RGNIR_COMPILE_CACHE_DIR") is None:
        enable_persistent_cache(machine_local_cache_dir("exp"))
    else:
        enable_persistent_cache()
    rng = np.random.default_rng(0)
    # config 2's pixel volume: 32 x 512^2 = 8192 x 1024 flat.
    flat = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (8192, _LANES), dtype=np.uint8))
    )
    pixels = flat.size

    def body(k):
        def go(i, carry):
            img, acc = carry
            s = chain_pass(img, k, block_r, mix)
            acc = acc + jnp.sum(s)
            # Data dependency for the chained-loop timing: perturb one
            # byte lane of the input from the checksum (cheap constant
            # cost, identical across K values, removed by the K-slope).
            img = img ^ jnp.uint8(jnp.int32(acc) & 1)
            return img, acc
        return go

    res = chain_time_ab(
        {f"k{k}": body(k) for k in ks},
        (flat, jnp.zeros((), jnp.float32)),
        ns=(10, 60), reps=reps,
    )
    k1, k2 = ks
    dt_ms = res[f"k{k2}"] - res[f"k{k1}"]
    out = {f"ms_per_step_k{k}": round(res[f"k{k}"], 4) for k in ks}
    out["block_r"] = block_r
    out["mix"] = mix
    if dt_ms > 0:
        ceiling_tops = pixels * (k2 - k1) / (dt_ms * 1e-3) / 1e12
        out["ceiling_dependent_tops"] = round(ceiling_tops, 3)
        out["pct_of_vpu_peak_7p2t"] = round(ceiling_tops / 7.2 * 100, 1)
        # Config 2's modeled op count (roofline table): 497 VPU ops/px.
        out["implied_config2_bound_gpix_s"] = round(
            ceiling_tops * 1e12 / 497 / 1e9, 2
        )
    return out


if __name__ == "__main__":
    br = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    mx = sys.argv[2] if len(sys.argv) > 2 else "f32"
    print(json.dumps(measure(block_r=br, mix=mx)))

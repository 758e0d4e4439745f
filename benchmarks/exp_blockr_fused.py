"""block_r sweep for the production fused kernel at any config shape.

exp_fusedsect.py's deltas were superlinear, suggesting VMEM-pressure
effects; this sweeps block_r over the SAME production invocation,
interleaved (chain_time_ab). 2026-08-19 config-2 result (batch=32,
512^2, 3 kinds, renders, q24 r0): br8 2.91 / br16 2.78 / br32 2.722 /
br64 2.687 ms — monotone, no spill cliff; br128 exceeds the 16 MB
scoped-VMEM limit. The autotune "fused" (hist-off) variant is seeded
from these sweeps; re-run per shape class before changing the seed.

Usage: python benchmarks/exp_blockr_fused.py [batch] [size] [blocks]
           [kinds] [renders]
  batch   0 = unbatched (C,H,W); N = natively batched (C,N,H,W)
  blocks  comma list, default 8,16,32,64
  kinds   comma list of index names, default NDVI,GNDVI,NDWI
  renders 1|0, default 1
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

from rgnir_tpu.utils.microbench import chain_time_ab  # noqa: E402


def main() -> None:
    from rgnir_tpu.config import IndexKind, WBConfig
    from rgnir_tpu.kernels.fused import S_SUM, fused_analyze_pallas
    from rgnir_tpu.kernels.hist import (
        planar_histograms_pallas,
        planar_histograms_pallas_batched,
    )
    from rgnir_tpu.ops.wb import wb_bounds_from_histogram
    from rgnir_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    blocks = (8, 16, 32, 64)
    if len(sys.argv) > 3:
        blocks = tuple(int(b) for b in sys.argv[3].split(","))
    names = (
        sys.argv[4].split(",") if len(sys.argv) > 4
        else ["NDVI", "GNDVI", "NDWI"]
    )
    renders = bool(int(sys.argv[5])) if len(sys.argv) > 5 else True
    kinds = tuple(IndexKind.parse(k) for k in names)
    n = size * size

    rng = np.random.default_rng(0)
    shape = (3, batch, size, size) if batch else (3, size, size)
    img = jax.device_put(jnp.asarray(
        rng.integers(0, 256, shape, dtype=np.uint8)
    ))
    salt = jax.device_put(jnp.asarray(
        rng.integers(0, 256, shape[1:], dtype=np.uint8)
    ))
    hist = (
        planar_histograms_pallas_batched(img) if batch
        else planar_histograms_pallas(img)
    )
    lo, hi = wb_bounds_from_histogram(hist, n=n, cfg=WBConfig())
    lo, hi = jax.device_put(lo), jax.device_put(hi)

    # production antipodal plan when NDWI rides GNDVI
    anti = None
    r0k = None
    if names == ["NDVI", "GNDVI", "NDWI"]:
        anti = (None, None, 1)
        r0k = (True, True, False)

    def body(block_r):
        def go(i, carry):
            im, acc = carry
            out = fused_analyze_pallas(
                im, lo, hi, kinds, block_r=block_r,
                with_renders=renders, with_round0=True,
                with_hist=False, round0_digit="q24",
                round0_kinds=r0k, antipodal=anti,
                with_idx_rows=True, bounds_nonneg=True,
            )
            wb = out[0]  # (C,H,W) / batched (C,B,H,W)
            if renders:
                # rgb: (K,3,H,W) / batched (K,3,B,H,W); one channel
                # plane broadcasts against wb either way
                planar = out[2][0, 0]
                nxt = wb ^ planar ^ salt
            else:
                nxt = wb ^ salt
            return nxt, acc + jnp.sum(out[3][..., S_SUM])
        return go

    bodies = {f"br{b}": body(b) for b in blocks}
    res = chain_time_ab(bodies, (img, jnp.zeros(())), ns=(10, 60), reps=6)
    mpix = (batch or 1) * n / 1e6
    print(json.dumps(
        {k: {"ms": round(v, 3), "mpix_s": round(mpix / v * 1e3, 1)}
         for k, v in res.items()},
        indent=1,
    ))


if __name__ == "__main__":
    main()

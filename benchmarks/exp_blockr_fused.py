"""block_r sweep for the FULL config-2 fused kernel.

exp_fusedsect.py's deltas are superlinear — the r0 dots cost 0.48 ms
marginal when renders are on but one-hot-build+r0 together only
0.34 ms without renders — suggesting the full kernel's VMEM working
set (per canonical kind: two (16, n_blk) one-hots + a (48, n_blk)
plane intermediate, n_blk = block_r*1024) forces Mosaic into spills
or serialization at the production block_r. Sweep block_r over the
same full production invocation, interleaved.

Usage: python benchmarks/exp_blockr_fused.py [batch] [size]
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
    from rgnir_tpu.kernels.hist import planar_histograms_pallas_batched
    from rgnir_tpu.ops.wb import wb_bounds_from_histogram
    from rgnir_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    kinds = tuple(IndexKind.parse(k) for k in ("NDVI", "GNDVI", "NDWI"))
    n = size * size

    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (3, batch, size, size), dtype=np.uint8)
    ))
    salt = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (3, batch, size, size), dtype=np.uint8)
    ))
    hist = planar_histograms_pallas_batched(img)
    lo, hi = wb_bounds_from_histogram(hist, n=n, cfg=WBConfig())
    lo, hi = jax.device_put(lo), jax.device_put(hi)

    def body(block_r):
        def go(i, carry):
            im, acc = carry
            out = fused_analyze_pallas(
                im, lo, hi, kinds, block_r=block_r,
                with_renders=True, with_round0=True,
                with_hist=False, round0_digit="q24",
                round0_kinds=(True, True, False),
                antipodal=(None, None, 1),
                with_idx_rows=True, bounds_nonneg=True,
            )
            nxt = out[0] ^ out[2][:, 0] ^ salt
            return nxt, acc + jnp.sum(out[3][..., S_SUM])
        return go

    # sublane constraint: block_r % 8 == 0; must divide rows-per-frame
    # (256 at 512^2) for the batched spf layout
    bodies = {f"br{b}": body(b) for b in (8, 16, 32, 64)}
    res = chain_time_ab(bodies, (img, jnp.zeros(())), ns=(10, 60), reps=6)
    mpix = batch * n / 1e6
    print(json.dumps(
        {k: {"ms": round(v, 3), "mpix_s": round(mpix / v * 1e3, 1)}
         for k, v in res.items()},
        indent=1,
    ))


if __name__ == "__main__":
    main()

"""A/B: median radix-select with the fused kernel's round-0 histogram
vs the 4-round select (config 2 shape: batch 32 x 512^2, 3 indices +
renders). Interleaved chain_time_ab — the only trustworthy comparison
on this shared chip (BENCHMARKS.md timing notes).

Usage: python benchmarks/exp_round0.py [batch] [size]
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
    from rgnir_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    kinds = ("NDVI", "GNDVI", "NDWI")

    from rgnir_tpu.config import IndexKind, WBConfig
    from rgnir_tpu.kernels.fused import fused_analyze_pallas
    from rgnir_tpu.kernels.hist import planar_histograms_pallas
    from rgnir_tpu.kernels.select import masked_median_pallas
    from rgnir_tpu.ops.wb import wb_bounds_from_histogram

    kk = tuple(IndexKind.parse(k) for k in kinds)
    cfg = WBConfig()
    n = size * size

    def make_body(with_round0: bool):
        def core(img_hwc):
            pl_img = jnp.moveaxis(img_hwc, -1, -3)
            hist = planar_histograms_pallas(pl_img)
            lo, hi = wb_bounds_from_histogram(hist, n=n, cfg=cfg)
            return fused_analyze_pallas(
                pl_img, lo, hi, kk, with_renders=True,
                with_round0=with_round0,
            )

        def body(i, carry):
            img, acc = carry
            out = jax.vmap(core)(img)
            wb_pl, idx, rgb = out[0], out[1], out[2]
            r0 = out[4] if with_round0 else None
            meds = masked_median_pallas(
                idx, n, reduce_ndim=2, round0_hist=r0
            )
            nxt = jnp.moveaxis(wb_pl, -3, -1) ^ jnp.moveaxis(rgb[:, 0], -3, -1)
            return nxt, acc + jnp.sum(meds)

        return body

    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
    ))
    res = chain_time_ab(
        {"round0_fused": make_body(True), "four_rounds": make_body(False)},
        (img, jnp.zeros(())), ns=(10, 60), reps=6,
    )
    mpix = batch * n / 1e6
    out = {
        k: {"ms": round(v, 3), "mpix_s": round(mpix / v * 1e3, 1)}
        for k, v in res.items()
    }
    out["speedup"] = round(res["four_rounds"] / res["round0_fused"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

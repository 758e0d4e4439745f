"""Interleaved stage isolation for config 2 (batch 32 x 512^2, 3 idx +
renders): nested bodies A ⊂ B ⊂ C ⊂ D timed with chain_time_ab so every
cell sees the same contention; adjacent differences are the stage costs.

  A: hist kernel (WB bounds)
  B: A + fused kernel WITH renders (wb/idx/renders/stats [+r0])
  C: B + median select (round0-fused path)
  D: C + two-pass variance + (even-n) successor min  == production

Usage: python benchmarks/exp_stages.py [batch] [size]
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
    from rgnir_tpu.kernels.fused import S_SUM, fused_analyze_pallas
    from rgnir_tpu.kernels.hist import planar_histograms_pallas
    from rgnir_tpu.kernels.select import masked_median_pallas
    from rgnir_tpu.ops.wb import wb_bounds_from_histogram

    kk = tuple(IndexKind.parse(k) for k in kinds)
    cfg = WBConfig()
    n = size * size

    def hist_bounds(img):
        pl_img = jnp.moveaxis(img, -1, -3)
        hist = planar_histograms_pallas(pl_img)
        lo, hi = wb_bounds_from_histogram(hist, n=n, cfg=cfg)
        return pl_img, lo, hi

    def body_a(i, carry):
        img, acc = carry
        _, lo, hi = jax.vmap(hist_bounds)(img)
        return img, acc + jnp.sum(lo) + jnp.sum(hi)

    # Production configuration (kernels/pipeline): q24 round-0 digit,
    # antipodal plan (NDWI derived from GNDVI -> take_prefix=(3,2)),
    # reference-parity stat set (hist off). Round 2 of this experiment
    # measured the DEFAULTS instead (hist on, f32 4-round select) and
    # blamed the fused kernel for 73% of the step — wrong by the cost
    # of the hist section; these cells now mirror production exactly.
    nc = 2

    def fused_out(img):
        pl_img, lo, hi = jax.vmap(hist_bounds)(img)
        out = jax.vmap(
            lambda p, l, h: fused_analyze_pallas(
                p, l, h, kk, with_renders=True, with_round0=True,
                with_hist=False, round0_digit="q24",
                round0_kinds=(True,) * nc + (False,) * (len(kk) - nc),
            )
        )(pl_img, lo, hi)
        return out

    def body_b(i, carry):
        img, acc = carry
        out = fused_out(img)
        wb_pl, rgb = out[0], out[2]
        nxt = jnp.moveaxis(wb_pl, -3, -1) ^ jnp.moveaxis(rgb[:, 0], -3, -1)
        return nxt, acc + jnp.sum(out[3][..., S_SUM])

    def body_c(i, carry):
        img, acc = carry
        out = fused_out(img)
        wb_pl, idx, rgb, r0 = out[0], out[1], out[2], out[4]
        meds = masked_median_pallas(
            idx, n, reduce_ndim=2, round0_hist=r0[..., :nc, :],
            take_prefix=(len(kk), nc), quantized=True,
        )
        nxt = jnp.moveaxis(wb_pl, -3, -1) ^ jnp.moveaxis(rgb[:, 0], -3, -1)
        return nxt, acc + jnp.sum(meds)

    def body_d(i, carry):
        img, acc = carry
        out = fused_out(img)
        wb_pl, idx, rgb, stats, r0 = out[:5]
        means = stats[..., S_SUM] / n
        meds, sumsq = masked_median_pallas(
            idx, n, reduce_ndim=2, round0_hist=r0[..., :nc, :],
            take_prefix=(len(kk), nc), quantized=True,
            means=means[..., :nc],
        )
        var = sumsq / n
        nxt = jnp.moveaxis(wb_pl, -3, -1) ^ jnp.moveaxis(rgb[:, 0], -3, -1)
        return nxt, acc + jnp.sum(meds) + jnp.sum(var)

    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
    ))
    res = chain_time_ab(
        {"A_hist": body_a, "B_fused": body_b, "C_select": body_c,
         "D_full": body_d},
        (img, jnp.zeros(())), ns=(10, 60), reps=6,
    )
    mpix = batch * n / 1e6
    stages = {
        "hist": res["A_hist"],
        "fused+renders": res["B_fused"] - res["A_hist"],
        "median_select(r0-fused)": res["C_select"] - res["B_fused"],
        "variance+succ": res["D_full"] - res["C_select"],
        "TOTAL": res["D_full"],
    }
    print(json.dumps({
        "cells_ms": {k: round(v, 3) for k, v in res.items()},
        "stages_ms": {k: round(v, 3) for k, v in stages.items()},
        "total_mpix_s": round(mpix / res["D_full"] * 1e3, 1),
    }))


if __name__ == "__main__":
    main()

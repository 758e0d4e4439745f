"""Within-kernel section ablation of the fused kernel at config-2 shape.

exp_stages.py located 76% of config 2's step inside the fused kernel;
this experiment opens the kernel itself. Every variant is the SAME
native-batched production invocation (32x512^2, 3 kinds, antipodal
plan, q24 round-0 digit) with one section statically elided via the
kernel's existing flags, timed interleaved (chain_time_ab) so the
adjacent differences are honest same-window section costs:

  full     renders + round0(q24)           == config-2 production
  nor0     renders, no round0              delta = the 2 r0 MXU dots
  norend   no renders, round0(q24)         delta = render dot + lo
           (one-hots still built for r0)     multiply-reduce + unpack
                                             + rgb stores (3 kinds)
  bare     no renders, no round0           delta vs norend = i256 +
                                             hi/lo one-hot build (2
                                             canonical kinds) + r0 dots
  k1       ONE kind, renders + round0      per-kind scaling check

Compare each measured delta with benchmarks/roofline.py's modeled op
shares: a section whose cost is far above its op share is where the
issue-rate bound actually lives (dot operand staging, relayouts);
matching shares mean the kernel is uniformly issue-bound and the
roofline's VPU-ops model is the wall.

Every body consumes stats + one planar output into the carry the same
way (xor against a fixed random tensor keeps content varied), so the
consumption cost is a constant across variants.

Usage: python benchmarks/exp_fusedsect.py [batch] [size]
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
    kinds3 = tuple(
        IndexKind.parse(k) for k in ("NDVI", "GNDVI", "NDWI")
    )
    n = size * size

    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (3, batch, size, size), dtype=np.uint8)
    ))
    salt = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (3, batch, size, size), dtype=np.uint8)
    ))
    # fixed per-frame WB bounds: bounds VALUES change arithmetic inputs,
    # never kernel cost; keeping them out of the loop isolates the fused
    # kernel as the only timed stage
    hist = planar_histograms_pallas_batched(img)
    lo, hi = wb_bounds_from_histogram(hist, n=n, cfg=WBConfig())
    lo, hi = jax.device_put(lo), jax.device_put(hi)

    # production antipodal plan for (NDVI, GNDVI, NDWI): NDWI = -GNDVI
    nc = 2
    r0k3 = (True,) * nc + (False,)
    anti3 = (None, None, 1)

    def body(kinds, with_renders, with_round0, round0_kinds, antipodal):
        def go(i, carry):
            im, acc = carry
            out = fused_analyze_pallas(
                im, lo, hi, kinds,
                with_renders=with_renders, with_round0=with_round0,
                with_hist=False, round0_digit="q24",
                round0_kinds=round0_kinds, antipodal=antipodal,
                with_idx_rows=True, bounds_nonneg=True,
            )
            wb = out[0]
            rgb = out[2]
            planar = rgb[:, 0] if rgb is not None else wb
            nxt = wb ^ planar ^ salt
            return nxt, acc + jnp.sum(out[3][..., S_SUM])
        return go

    bodies = {
        "full": body(kinds3, True, True, r0k3, anti3),
        "nor0": body(kinds3, True, False, None, anti3),
        "norend": body(kinds3, False, True, r0k3, anti3),
        "bare": body(kinds3, False, False, None, anti3),
        "k1": body(kinds3[:1], True, True, None, None),
    }
    res = chain_time_ab(bodies, (img, jnp.zeros(())), ns=(10, 60), reps=6)
    mpix = batch * n / 1e6
    out = {
        k: {"ms": round(v, 3), "mpix_s": round(mpix / v * 1e3, 1)}
        for k, v in res.items()
    }
    d = {
        "r0_dots (full-nor0)": res["full"] - res["nor0"],
        "render_tail (full-norend)": res["full"] - res["norend"],
        "onehots+r0 (norend-bare)": res["norend"] - res["bare"],
        "render_all (nor0-bare)": res["nor0"] - res["bare"],
        "per_kind (full-k1)/2": (res["full"] - res["k1"]) / 2,
    }
    out["deltas_ms"] = {k: round(v, 3) for k, v in d.items()}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

"""Same-window A/B of the antipodal-kind median plan at config-2 shape.

The plan (kernels/pipeline._median_plan) derives NDWI's median/variance
from GNDVI's by exact negation, skipping NDWI's round-0 histogram,
radix-select rounds (select.take_prefix — rows never read), successor
pass, and variance pass.

Baseline trick: the kind order ("NDWI", "GNDVI", "NDVI") has no
canonical PREFIX (NDVI's pair lands at position 2), so the plan
disables itself and every kind pays full price — a bitwise-equivalent
workload (render LUTs and thresholds are per-kind but symmetric) that
serves as the same-process "before".

Usage: python benchmarks/exp_config2.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))


def main() -> None:
    from rgnir_tpu.pipeline.dispatch import analyze_image_auto
    from rgnir_tpu.utils.compile_cache import enable_persistent_cache
    from rgnir_tpu.utils.microbench import chain_time_ab

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (32, 512, 512, 3), dtype=np.uint8)
    ))

    def body(kinds):
        def go(i, carry):
            im, acc = carry
            r = analyze_image_auto(
                im, kinds=kinds, with_renders=True, with_hist=False
            )
            nxt = r.wb ^ r.renders[kinds[0]]
            for k in kinds:
                acc = acc + r.stats[k].mean + r.stats[k].median
            return nxt, acc
        return go

    res = chain_time_ab(
        {
            "plan_off": body(("NDWI", "GNDVI", "NDVI")),
            "plan_on": body(("NDVI", "GNDVI", "NDWI")),
        },
        (img, jnp.zeros(32)), ns=(10, 60), reps=6,
    )
    out = {k: round(v, 3) for k, v in res.items()}
    out["gain_ms"] = round(res["plan_off"] - res["plan_on"], 3)
    mpix = 32 * 512 * 512 / 1e6
    out["mpix_s_on"] = round(mpix / res["plan_on"] * 1e3, 1)
    out["mpix_s_off"] = round(mpix / res["plan_off"] * 1e3, 1)
    print(out)


if __name__ == "__main__":
    main()

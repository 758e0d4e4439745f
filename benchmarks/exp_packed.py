"""Same-window A/B of packed_out (u32 render/wb stores + bitcast HWC).

packed_out=True: the fused kernel stores one i32 ``r | g<<8 | b<<16``
per pixel for wb and each render (no 4:1 u8 lane-packing cast chains),
and the pipeline recovers HWC u8 by bitcast+slice instead of the
planar->HWC moveaxis transpose pass.

Usage: python benchmarks/exp_packed.py
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
    from rgnir_tpu.kernels.pipeline import analyze_image_kernel
    from rgnir_tpu.utils.compile_cache import enable_persistent_cache
    from rgnir_tpu.utils.microbench import chain_time_ab

    enable_persistent_cache()
    kinds = ("NDVI", "GNDVI", "NDWI")
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (32, 512, 512, 3), dtype=np.uint8)
    ))

    def body(packed):
        def go(i, carry):
            im, acc = carry
            r = analyze_image_kernel(
                im, kinds=kinds, with_renders=True, with_hist=False,
                packed_out=packed,
            )
            nxt = r.wb ^ r.renders[kinds[0]]
            for k in kinds:
                acc = acc + r.stats[k].mean + r.stats[k].median
            return nxt, acc
        return go

    res = chain_time_ab(
        {"packed": body(True), "unpacked": body(False)},
        (img, jnp.zeros(32)), ns=(10, 60), reps=6,
    )
    out = {k: round(v, 3) for k, v in res.items()}
    out["gain_ms"] = round(res["unpacked"] - res["packed"], 3)
    mpix = 32 * 512 * 512 / 1e6
    out["mpix_s_packed"] = round(mpix / res["packed"] * 1e3, 1)
    out["mpix_s_unpacked"] = round(mpix / res["unpacked"] * 1e3, 1)
    print(out)


if __name__ == "__main__":
    main()

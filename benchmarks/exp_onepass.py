"""A/B: one-pass q24 select (VMEM-cached rounds 1-2 + tail,
kernels/select._q24_onepass_kernel) vs the 3-pass path, measured on the
FULL production step at config-2 shapes (batch 32 x 512^2, 3 kinds,
renders on, hist off) with interleaved min-slope timing.

The code path is chosen at trace time from
select.Q24_ONEPASS_MAX_CACHE_BYTES, so each variant is a separate jit
object traced under its own setting; after tracing, the executables are
fixed and the interleaved loop sees the same contention for both.

Usage: python benchmarks/exp_onepass.py [batch] [size]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))


def main() -> None:
    from rgnir_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import rgnir_tpu.kernels.select as sel
    from rgnir_tpu.kernels.pipeline import analyze_image_kernel

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    kinds = ("NDVI", "GNDVI", "NDWI")
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
    x = jax.device_put(jnp.asarray(imgs))

    def make_run():
        @jax.jit
        def run(img, n):
            def body(i, carry):
                img, acc = carry
                res = analyze_image_kernel(
                    img, kinds=kinds, with_renders=True, with_hist=False
                )
                acc = acc + sum(
                    res.stats[k].median + res.stats[k].std for k in kinds
                )
                return res.wb, acc

            return jax.lax.fori_loop(
                0, jnp.asarray(n, jnp.int32), body, (img, jnp.zeros(batch))
            )

        return run

    ns = (10, 60)
    variants = {}
    orig = sel.Q24_ONEPASS_MAX_CACHE_BYTES
    for name, budget in (("onepass", orig), ("threepass", 0)):
        sel.Q24_ONEPASS_MAX_CACHE_BYTES = budget
        run = make_run()
        for n in ns:  # trace (path baked) + warm
            np.asarray(run(x, n)[1])
        variants[name] = run
    sel.Q24_ONEPASS_MAX_CACHE_BYTES = orig

    best = {(k, n): float("inf") for k in variants for n in ns}
    for _ in range(6):
        for n in ns:
            for k in variants:
                t0 = time.perf_counter()
                np.asarray(variants[k](x, n)[1])
                best[(k, n)] = min(
                    best[(k, n)], time.perf_counter() - t0
                )
    mpix = batch * size * size / 1e6
    out = {}
    for k in variants:
        dt = (best[(k, ns[1])] - best[(k, ns[0])]) / (ns[1] - ns[0])
        out[k] = {
            "ms_per_step": round(dt * 1e3, 3),
            "mpix_per_s": round(mpix / dt, 1),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""A/B: one-pass q24 select (VMEM-cached rounds 1-2 + tail,
kernels/select._q24_onepass_kernel) vs the 3-pass path, measured on the
FULL production step at config-2 shapes (batch 32 x 512^2, 3 kinds,
renders on, hist off) with interleaved min-slope timing.

The path is selected via analyze_image_kernel(select_onepass=...) — a
STATIC jit argument, so each variant compiles its own executable.
(The first version of this harness patched
select.Q24_ONEPASS_MAX_CACHE_BYTES between traces instead; that global
is read at trace time inside a nested module-level jit whose jaxpr was
already cached, so both variants silently measured the one-pass
executable. Never A/B via trace-time globals.)

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

    from rgnir_tpu.kernels.pipeline import analyze_image_kernel

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    kinds = ("NDVI", "GNDVI", "NDWI")
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
    x = jax.device_put(jnp.asarray(imgs))

    def make_run(onepass: bool):
        @jax.jit
        def run(img, n):
            def body(i, carry):
                img, acc = carry
                res = analyze_image_kernel(
                    img, kinds=kinds, with_renders=True,
                    with_hist=False, select_onepass=onepass,
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
    for name, onepass in (("onepass", True), ("threepass", False)):
        run = make_run(onepass)
        for n in ns:  # trace (path baked per static arg) + warm
            np.asarray(run(x, n)[1])
        variants[name] = run

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

"""Component-level timing of the kernel pipeline on the real chip.

Breaks config 2 (batch 32 x 512^2, 3 indices + renders) into its
stages so optimization effort goes where the time actually is:
hist kernel, fused kernel (with/without renders), median radix-select,
two-pass variance. Honest slope timing (tools/tpu_microbench).

CAUTION on absolutes: these sequential per-stage measurements have
been observed up to ~9x above an interleaved chain_time_ab of the
identical body minutes apart (hist stage 6.1 ms here vs 0.69 ms A/B,
2026-08-17) — sustained contention drift between stages is not
corrected by the slope estimator. Trust only the RELATIVE mix within
one run, and settle any decision with a same-window chain_time_ab.

Usage: python benchmarks/profile_components.py [batch] [size]
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
sys.path.insert(0, str(_ROOT / "tools"))
from tpu_microbench import chain_time  # noqa: E402

from rgnir_tpu.config import IndexKind, WBConfig  # noqa: E402
from rgnir_tpu.kernels.fused import fused_analyze_pallas  # noqa: E402
from rgnir_tpu.kernels.hist import planar_histograms_pallas  # noqa: E402
from rgnir_tpu.kernels.pipeline import analyze_image_kernel  # noqa: E402
from rgnir_tpu.kernels.select import masked_median_pallas  # noqa: E402
from rgnir_tpu.ops.wb import wb_bounds_from_histogram  # noqa: E402

KINDS = tuple(IndexKind.parse(k) for k in ("NDVI", "GNDVI", "NDWI"))


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    from rgnir_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    imgs = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
    ))
    mpix = batch * size * size / 1e6
    cfg = WBConfig()
    n = size * size

    def persist(x):
        # fold a stage output back into the uint8 carry (data dependence)
        return (imgs ^ x.astype(jnp.uint8)[..., None, None, None]).astype(
            jnp.uint8
        )

    results = {}

    def report(name, ms):
        results[name] = round(ms, 3)
        print(json.dumps({"stage": name, "ms": round(ms, 3),
                          "mpix_per_s": round(mpix / ms * 1e3, 1)}),
              flush=True)

    # --- full pipeline, with and without renders -------------------------
    def full_body(renders):
        def body(i, c):
            res = analyze_image_kernel(c, tuple(k.value for k in KINDS),
                                       with_renders=renders)
            acc = res.stats["NDVI"].mean + res.stats["NDVI"].median
            return persist(jnp.sum(acc))
        return body

    report("full_with_renders", chain_time(full_body(True), imgs))
    report("full_no_renders", chain_time(full_body(False), imgs))

    # --- hist kernel only --------------------------------------------------
    def hist_body(i, c):
        pl_img = jnp.moveaxis(c, -1, -3)
        hist = jax.vmap(planar_histograms_pallas)(pl_img)
        return persist(jnp.sum(hist[:, 0, 0]))

    report("hist_kernel", chain_time(hist_body, imgs))

    # --- hist + fused (no median, no variance) ------------------------------
    def fused_body(renders):
        def body(i, c):
            pl_img = jnp.moveaxis(c, -1, -3)

            def core(x):
                h = planar_histograms_pallas(x)
                lo, hi = wb_bounds_from_histogram(h, n=n, cfg=cfg)
                return fused_analyze_pallas(
                    x, lo, hi, KINDS, with_renders=renders
                )
            wb, idx, rgb, stats = jax.vmap(core)(pl_img)
            return persist(jnp.sum(stats[:, 0, 0]) + jnp.sum(idx[:, 0, 0, 0]))
        return body

    report("hist+fused_renders", chain_time(fused_body(True), imgs))
    report("hist+fused_no_renders", chain_time(fused_body(False), imgs))

    # --- median select on precomputed index maps ----------------------------
    idx_maps = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (batch, len(KINDS), size, size)).astype(np.float32)
    ))

    def median_body(i, c):
        meds = masked_median_pallas(c, n, reduce_ndim=2)
        return c + (meds[..., None, None] * 0.0)  # dependence, no drift

    report("median_select", chain_time(median_body, idx_maps))

    # --- two-pass variance on precomputed index maps -------------------------
    def var_body(i, c):
        v = jnp.mean(jnp.square(c - jnp.mean(c, axis=(-2, -1),
                                             keepdims=True)), axis=(-2, -1))
        return c + (v[..., None, None] * 0.0)

    report("variance_pass", chain_time(var_body, idx_maps))

    print(json.dumps({"summary": results, "mpix": mpix}), flush=True)


if __name__ == "__main__":
    main()

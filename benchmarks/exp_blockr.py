"""A/B: fused-kernel block_r sweep on the config-2 shape (batch 32 x
512^2, 3 kinds + renders). Grid steps per image = 256/block_r; if
per-step fixed overhead matters, bigger blocks win until VMEM pressure
bites. Interleaved chain_time_ab (same-window cells only).

Usage: python benchmarks/exp_blockr.py [batch] [size] [blocks...]
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
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    batch = int(args[0]) if args else 32
    size = int(args[1]) if len(args) > 1 else 512
    blocks = [int(b) for b in args[2:]] or [16, 32, 64, 128]
    kinds = ("NDVI", "GNDVI", "NDWI")

    from rgnir_tpu.config import IndexKind, WBConfig
    from rgnir_tpu.kernels.fused import S_SUM, fused_analyze_pallas
    from rgnir_tpu.kernels.hist import planar_histograms_pallas
    from rgnir_tpu.ops.wb import wb_bounds_from_histogram

    kk = tuple(IndexKind.parse(k) for k in kinds)
    cfg = WBConfig()
    n = size * size

    def make_body(block_r):
        def core(img_hwc):
            pl_img = jnp.moveaxis(img_hwc, -1, -3)
            hist = planar_histograms_pallas(pl_img)
            lo, hi = wb_bounds_from_histogram(hist, n=n, cfg=cfg)
            return fused_analyze_pallas(
                pl_img, lo, hi, kk, with_renders=True,
                with_round0=True, block_r=block_r,
            )

        def body(i, carry):
            img, acc = carry
            out = jax.vmap(core)(img)
            wb_pl, rgb = out[0], out[2]
            nxt = (
                jnp.moveaxis(wb_pl, -3, -1)
                ^ jnp.moveaxis(rgb[:, 0], -3, -1)
            )
            return nxt, acc + jnp.sum(out[3][..., S_SUM])

        return body

    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
    ))
    bodies = {f"block{b}": make_body(b) for b in blocks}
    res = chain_time_ab(bodies, (img, jnp.zeros(())), ns=(10, 60), reps=6)
    mpix = batch * n / 1e6
    print(json.dumps({
        k: {"ms": round(v, 3), "mpix_s": round(mpix / v * 1e3, 1)}
        for k, v in res.items()
    }))


if __name__ == "__main__":
    main()

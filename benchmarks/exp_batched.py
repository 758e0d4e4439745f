"""A/B: native flat-grid batching vs the old vmap batch composition.

The round-2/3 pipeline batched the hist/fused kernels with jax.vmap
(extra Mosaic batch grid dim) and fed the select from the re-packed
index maps. The round-3 native path stacks frames along the kernels'
flat row dimension (one grid, per-frame accumulator blocks) and hands
the select the fused kernel's raw idx_rows. This experiment times both
compositions interleaved in the same window (chain_time_ab) at the two
batched bench shapes (config 2: 32x512^2 with renders; config 4b:
8x1080p stats-only).

Usage: python benchmarks/exp_batched.py [--quick]
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

from rgnir_tpu.config import WBConfig  # noqa: E402
from rgnir_tpu.kernels.fused import S_SUM  # noqa: E402
from rgnir_tpu.kernels.pipeline import (  # noqa: E402
    _core,
    _median_plan,
    analyze_image_kernel,
)
from rgnir_tpu.kernels.select import masked_median_pallas  # noqa: E402
from rgnir_tpu.utils.microbench import chain_time_ab  # noqa: E402


def old_vmap_step(img, kinds, with_renders, with_hist):
    """The pre-native batched composition: vmap(_core) + repacked select."""
    from rgnir_tpu.config import IndexKind

    kinds = tuple(IndexKind.parse(k) for k in kinds)
    nk = len(kinds)
    plan = _median_plan(kinds)
    if plan is not None:
        nc, slots = plan
        round0_kinds = (True,) * nc + (False,) * (nk - nc)
        take_prefix = (nk, nc)
        antipodal = tuple(
            slots[k][0] if slots[k][1] else None for k in range(nk)
        )
    else:
        nc = nk
        round0_kinds = None
        take_prefix = None
        antipodal = None
    n = img.shape[-3] * img.shape[-2]
    out = jax.vmap(
        lambda x: _core(x, kinds, WBConfig(), with_renders, with_hist,
                        round0_kinds, False, antipodal)
    )(img)
    wb_pl, idx, rgb, stats = out[:4]
    r0 = out[4]
    means_all = stats[..., S_SUM] / n
    meds, ss = masked_median_pallas(
        idx, n, reduce_ndim=2, round0_hist=r0[..., :nc, :],
        take_prefix=take_prefix, quantized=True,
        means=means_all[..., :nc],
    )
    acc = means_all.sum() + meds.sum()
    nxt = (wb_pl ^ rgb[:, 0]) if with_renders else wb_pl  # (B,3,H,W) u8
    return jnp.moveaxis(nxt, -3, -1), acc  # back to HWC for the carry


def main() -> None:
    quick = "--quick" in sys.argv
    ns = (10, 60) if quick else (10, 110)
    kinds = ("NDVI", "GNDVI", "NDWI")
    for name, shape, renders in (
        ("config2_batch32_512", (32, 512, 512, 3), True),
        ("config4b_batch8_1080p", (8, 1080, 1920, 3), False),
    ):
        rng = np.random.default_rng(0)
        img = jax.device_put(
            jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
        )

        def body_new(i, carry, renders=renders):
            im, acc = carry
            r = analyze_image_kernel(
                im, kinds=kinds, with_renders=renders, with_hist=False
            )
            nxt = (r.wb ^ r.renders[kinds[0]]) if renders else r.wb
            for k in kinds:
                acc = acc + r.stats[k].mean + r.stats[k].median
            return nxt, acc

        def body_old(i, carry, renders=renders):
            im, acc = carry
            nxt, a = old_vmap_step(im, kinds, renders, False)
            return nxt, acc + a

        ms = chain_time_ab(
            {"new_native": body_new, "old_vmap": body_old},
            (img, jnp.zeros(shape[0])), ns=ns,
        )
        mpix = np.prod(shape[:-1]) / 1e6
        rec = {
            "experiment": name,
            "mpix": round(float(mpix), 2),
            **{
                k: {"ms": round(v, 3),
                    "mpix_per_s": round(float(mpix / v * 1e3), 1)}
                for k, v in ms.items()
            },
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

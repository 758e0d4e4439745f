"""Same-window A/B: in-kernel renders vs split-pass XLA renders at
config-2 shape (round-5 register-pressure follow-up).

exp_issuebound.py found a vector-register residency cliff (a
(128, 1024) f32 tile spills; the fused kernel at block_r=64 issues at
~19% of chain speed-of-light while the leaner select reaches ~51%).
Hypothesis: the fused kernel's render section — 210 of its 283 modeled
ops/px, holding byte planes + two 16-row one-hots live per kind on top
of the wb/index/stats tiles — is what starves the register file, and
moving the renders to a SEPARATE pass (ops.colormap.render_colormap:
the same nibble-one-hot MXU LUT, run by XLA over the already-written
index maps) trades one extra HBM read/write of the maps for a
register-resident kernel. The select precedent says pass-splitting can
win here (the 3-pass select beat the 1-pass cache kernel).

Both variants run the FULL production step (stats, median plan, q24
select) so the A/B captures every interaction (e.g. the no-render
kernel pays its own round-0 one-hot build). Renders are checked
bit-identical before timing.

Usage: python benchmarks/exp_splitrender.py [batch] [size]
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


def main() -> None:
    from rgnir_tpu.ops.colormap import render_colormap
    from rgnir_tpu.pipeline.dispatch import analyze_image_auto
    import os

    from rgnir_tpu.utils.compile_cache import (
        enable_persistent_cache, machine_local_cache_dir,
    )
    from rgnir_tpu.utils.microbench import chain_time_ab

    # One-off sweep kernels must not pollute the repo-committed cache
    # (threshold-0 persistence): default to the per-user experiment dir.
    if os.environ.get("RGNIR_COMPILE_CACHE_DIR") is None:
        enable_persistent_cache(machine_local_cache_dir("exp"))
    else:
        enable_persistent_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    kinds = ("NDVI", "GNDVI", "NDWI")
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
    ))

    # Bit-identity gate: the split render must produce the exact bytes
    # of the in-kernel render for every kind.
    r_in = analyze_image_auto(img, kinds=kinds, with_renders=True,
                              with_hist=False)
    r_sp = analyze_image_auto(img, kinds=kinds, with_renders=False,
                              with_hist=False)
    for k in kinds:
        a = np.asarray(r_in.renders[k])
        b = np.asarray(render_colormap(r_sp.indices[k], k))
        assert a.shape == b.shape, (k, a.shape, b.shape)
        assert np.array_equal(a, b), f"{k}: split render differs"
    print("bit-identity: ok", file=sys.stderr)

    def body_inkernel(i, carry):
        im, acc = carry
        r = analyze_image_auto(im, kinds=kinds, with_renders=True,
                               with_hist=False)
        nxt = r.wb ^ r.renders[kinds[0]]
        for k in kinds:
            acc = acc + r.stats[k].mean + r.stats[k].median
        return nxt, acc

    def body_split(i, carry):
        im, acc = carry
        r = analyze_image_auto(im, kinds=kinds, with_renders=False,
                               with_hist=False)
        rend = {k: render_colormap(r.indices[k], k) for k in kinds}
        nxt = r.wb ^ rend[kinds[0]]
        # every render must be materialized, like the in-kernel body's
        # kernel outputs — fold the others into the carry too
        for k in kinds[1:]:
            nxt = nxt ^ rend[k]
        for k in kinds:
            acc = acc + r.stats[k].mean + r.stats[k].median
        return nxt, acc

    def body_inkernel_all(i, carry):
        # fair variant of the in-kernel body with ALL renders folded in
        im, acc = carry
        r = analyze_image_auto(im, kinds=kinds, with_renders=True,
                               with_hist=False)
        nxt = r.wb
        for k in kinds:
            nxt = nxt ^ r.renders[k]
        for k in kinds:
            acc = acc + r.stats[k].mean + r.stats[k].median
        return nxt, acc

    res = chain_time_ab(
        {
            "inkernel": body_inkernel_all,
            "split_xla": body_split,
        },
        (img, jnp.zeros(batch)), ns=(10, 60), reps=6,
    )
    mpix = batch * size * size / 1e6
    out = {k: round(v, 3) for k, v in res.items()}
    out["mpix_s_inkernel"] = round(mpix / res["inkernel"] * 1e3, 1)
    out["mpix_s_split"] = round(mpix / res["split_xla"] * 1e3, 1)
    out["split_speedup"] = round(res["inkernel"] / res["split_xla"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

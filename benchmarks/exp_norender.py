import json, sys
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from rgnir_tpu.pipeline.dispatch import analyze_image_auto
import os
from rgnir_tpu.utils.compile_cache import (
    enable_persistent_cache, machine_local_cache_dir,
)
from rgnir_tpu.utils.microbench import chain_time_ab
# one-off A/B compiles stay out of the repo-committed cache
if os.environ.get("RGNIR_COMPILE_CACHE_DIR") is None:
    enable_persistent_cache(machine_local_cache_dir("exp"))
else:
    enable_persistent_cache()
rng = np.random.default_rng(0)
img = jax.device_put(jnp.asarray(rng.integers(0, 256, (32,512,512,3), dtype=np.uint8)))
kinds = ("NDVI","GNDVI","NDWI")
def body(renders):
    def go(i, carry):
        im, acc = carry
        r = analyze_image_auto(im, kinds=kinds, with_renders=renders, with_hist=False)
        nxt = r.wb
        if renders:
            for k in kinds: nxt = nxt ^ r.renders[k]
        for k in kinds: acc = acc + r.stats[k].mean + r.stats[k].median
        return nxt, acc
    return go
res = chain_time_ab({"renders": body(True), "norender": body(False)},
                    (img, jnp.zeros(32)), ns=(10,60), reps=6)
out = {k: round(v,3) for k,v in res.items()}
out["render_marginal_ms"] = round(res["renders"]-res["norender"],3)
print(json.dumps(out))

"""Phase-by-phase timing of the bench cold start (round-3 verdict #1).

BENCH_r02 recorded 807.85 s of compile+first-run; committing the XLA
compilation cache (.jax_cache) took it to ~80 s. This probe splits the
remaining cost into phases so the next cut targets the right one:

  import     : `import jax` + rgnir_tpu modules
  backend    : jax.devices() — tunnel/axon session setup
  device_put : first host->device transfer
  trace      : jax.jit(...).lower() of the bench loop (pure Python)
  compile    : .compile() — cache lookup + deserialize + device load
  execute    : first real run (n=10) + host fetch
  second     : second run (n=110) + fetch (steady-state reference)

Run in a FRESH process (the point is the cold path):
  python tools/coldstart_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_T0 = time.perf_counter()
_LAST = _T0


def mark(phase: str) -> None:
    global _LAST
    now = time.perf_counter()
    print(f"{phase:12s} {now - _LAST:8.2f}s  (cum {now - _T0:7.2f}s)",
          flush=True)
    _LAST = now


def main() -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from rgnir_tpu.kernels.pipeline import analyze_image_kernel
    from rgnir_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    mark("import")

    jax.devices()
    mark("backend")

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (8, 1024, 1024, 3), dtype=np.uint8)
    x = jax.device_put(jnp.asarray(imgs))
    x.block_until_ready()
    mark("device_put")

    @jax.jit
    def run(img, n):
        def body(i, carry):
            img, acc = carry
            res = analyze_image_kernel(img, kinds=("NDVI",))
            acc = acc + res.stats["NDVI"].mean + res.stats["NDVI"].median
            return res.wb, acc
        return jax.lax.fori_loop(
            0, jnp.asarray(n, jnp.int32), body, (img, jnp.zeros(8))
        )

    lowered = run.lower(x, 10)
    mark("trace")

    compiled = lowered.compile()
    mark("compile")

    out = compiled(x, 10)
    np.asarray(out[1])
    mark("execute")

    out = compiled(x, 110)
    np.asarray(out[1])
    mark("second")


if __name__ == "__main__":
    main()

"""Decompose bench.py phase 1: where does warm start go?

Times, separately:
  1. tunnel probe   — a 1-element add, compiled fresh (tiny), run once.
  2. AOT compile    — run.lower(x, n).compile() on the headline jit
                      (warm = persistent-cache deserialize + TPU program
                      load through the tunnel; no execution).
  3. first run      — the first execution of the compiled fn (ns=1).
  4. second run     — ns=5 (steady dispatch).

Prints one JSON line with all four timings so repeated runs across
windows can attribute the 145-410 s phase-1 range seen by the driver
(VERDICT round 4: phase 1 took 293 s fully warm).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

T0 = time.monotonic()


def log(msg):
    print(f"[{time.monotonic()-T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    out = {}
    t = time.monotonic()
    import jax
    import jax.numpy as jnp
    out["import_jax_s"] = round(time.monotonic() - t, 2)

    import os

    from rgnir_tpu.utils.compile_cache import (
        enable_persistent_cache, machine_local_cache_dir,
    )
    t = time.monotonic()
    # Diagnostic probes compile one-off ops; keep them out of the
    # repo-committed cache (threshold-0 persistence).
    if os.environ.get("RGNIR_COMPILE_CACHE_DIR") is None:
        enable_persistent_cache(machine_local_cache_dir("exp"))
    else:
        enable_persistent_cache()
    dev = jax.devices()
    out["backend_init_s"] = round(time.monotonic() - t, 2)
    log(f"devices {dev} init {out['backend_init_s']}s")

    # 1. tunnel probe: trivial op. Fresh-compiled on this machine's
    # first run (measuring the remote-compile queue), cache-hit after.
    t = time.monotonic()
    probe = jax.jit(lambda a, b: a + b)
    r = probe(jnp.ones((3,), jnp.float32), jnp.ones((3,), jnp.float32))
    np.asarray(r)
    out["tunnel_probe_s"] = round(time.monotonic() - t, 2)
    log(f"tunnel probe {out['tunnel_probe_s']}s")

    # 2. AOT compile of the headline executable.
    from rgnir_tpu.kernels.pipeline import analyze_image_kernel
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (8, 1024, 1024, 3), dtype=np.uint8)
    x = jax.device_put(jnp.asarray(imgs))

    @jax.jit
    def run(img, n):
        def body(i, carry):
            img, acc = carry
            res = analyze_image_kernel(img, kinds=("NDVI",), with_hist=False)
            nxt = res.wb
            acc = acc + res.stats["NDVI"].mean + res.stats["NDVI"].median
            return nxt, acc
        return jax.lax.fori_loop(
            0, jnp.asarray(n, jnp.int32), body, (img, jnp.zeros(8))
        )

    t = time.monotonic()
    lowered = run.lower(x, 5)
    out["lower_s"] = round(time.monotonic() - t, 2)
    log(f"lower {out['lower_s']}s")

    t = time.monotonic()
    compiled = lowered.compile()
    out["compile_s"] = round(time.monotonic() - t, 2)
    log(f"compile (cache deserialize + program load) {out['compile_s']}s")

    t = time.monotonic()
    r = compiled(x, 1)
    np.asarray(r[1])
    out["first_run_n1_s"] = round(time.monotonic() - t, 2)
    log(f"first run n=1 {out['first_run_n1_s']}s")

    t = time.monotonic()
    r = compiled(x, 5)
    np.asarray(r[1])
    out["run_n5_s"] = round(time.monotonic() - t, 2)
    log(f"run n=5 {out['run_n5_s']}s")

    t = time.monotonic()
    r = compiled(x, 55)
    np.asarray(r[1])
    out["run_n55_s"] = round(time.monotonic() - t, 2)
    log(f"run n=55 {out['run_n55_s']}s")
    dt = (out["run_n55_s"] - out["run_n5_s"]) / 50.0
    if dt > 0:
        out["slope_mpix_s"] = round(8 * 1024 * 1024 / 1e6 / dt, 1)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""Measured block-size selection with a tiny persistent cache.

``auto_block_r`` (kernels/hist.py) picks kernel block rows by a static
heuristic; the sweet spot drifts with device generation and image
class. This module lets a deployment *measure* the sweet spots once —
``rgnir-tpu tune`` or :func:`tune_kernels` — and caches the winners in
a JSON file keyed by (kernel, log2-pixel bucket, device kind). The
kernels consult the cache at TRACE time (block_r is a static argument
baked into each compiled executable): new processes and newly-traced
shapes pick up stored winners; executables already compiled in a
running process keep the block they were traced with until restart.
An empty cache means the heuristic stands, so nothing slows down or
changes behavior until a user opts in.

Tuning uses interleaved A/B slope timing (tools/tpu_microbench — the
shared-chip contention makes sequential sweeps incomparable), and the
candidates all produce bit-identical results (block size only changes
the grid), so caching winners is always safe.
"""

from __future__ import annotations

import json
import os
import threading
from pathlib import Path
from typing import Dict, Optional, Sequence

_LOCK = threading.Lock()
_CACHE: Optional[Dict[str, int]] = None
_CACHE_PATH: Optional[Path] = None
_DEVICE_KIND: Optional[str] = None


def cache_path() -> Path:
    env = os.environ.get("RGNIR_TPU_AUTOTUNE_CACHE")
    if env:
        return Path(env)
    return Path(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    ) / "rgnir_tpu" / "autotune.json"


def _device_kind() -> str:
    # Memoized: lookup_block_r runs on every kernel TRACE (and tuning
    # sweeps call it in a loop), and jax.devices() is not free. The
    # device set cannot change within a process; invalidate_cache()
    # resets anyway.
    global _DEVICE_KIND
    if _DEVICE_KIND is None:
        try:
            import jax

            _DEVICE_KIND = jax.devices()[0].device_kind.replace(" ", "_")
        except Exception:
            return "unknown"  # backend not ready: retry next call
    return _DEVICE_KIND


def _bucket(n_pixels: int) -> int:
    return max(0, n_pixels - 1).bit_length()  # ceil(log2(n))


def _key(kernel: str, n_pixels: int) -> str:
    return f"{_device_kind()}/{kernel}/b{_bucket(n_pixels)}"


def _seed() -> Dict[str, int]:
    """Winners measured on known device kinds, shipped with the package
    (``utils/autotune_seed.json``). Without this, a cold machine's
    heuristic block sizes differ from the tuned ones the committed
    compile cache (``.jax_cache``) was traced with — every executable
    would miss and recompile (the round-2 807 s cold start, reborn).
    A user's own ``rgnir-tpu tune`` run always overrides the seed."""
    try:
        p = Path(__file__).with_name("autotune_seed.json")
        return {str(k): int(v) for k, v in json.loads(p.read_text()).items()}
    except (OSError, ValueError, TypeError, AttributeError):
        return {}


def _read_user(path: Path) -> Dict[str, int]:
    try:
        return {
            str(k): int(v)
            for k, v in json.loads(path.read_text()).items()
        }
    except (OSError, ValueError, TypeError, AttributeError):
        # Missing, unreadable, or corrupt (non-dict JSON, null
        # values, ...): the seed/heuristic stands — never crash
        # dispatch.
        return {}


def _load() -> Dict[str, int]:
    global _CACHE, _CACHE_PATH
    path = cache_path()
    with _LOCK:
        if _CACHE is not None and _CACHE_PATH == path:
            return _CACHE
        _CACHE = {**_seed(), **_read_user(path)}
        _CACHE_PATH = path
        return _CACHE


def lookup_block_r(kernel: str, n_pixels: int) -> Optional[int]:
    """Cached block rows for (kernel, pixel bucket), or None."""
    return _load().get(_key(kernel, n_pixels))


def store_block_r(kernel: str, n_pixels: int, block_r: int) -> None:
    global _CACHE
    path = cache_path()
    with _LOCK:
        # Persist ONLY user-originated entries: writing the merged view
        # would freeze the current packaged seed values into the user
        # file, silently shadowing every future seed update (user
        # entries override the seed) — recreating the cold-start
        # recompile the seed exists to prevent. Re-read the file so a
        # concurrent tune's buckets are merged, never clobbered.
        user = _read_user(path)
        user[_key(kernel, n_pixels)] = int(block_r)
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp")
        tmp.write_text(json.dumps(user, indent=2, sort_keys=True))
        tmp.replace(path)
        _CACHE = {**_seed(), **user}


def invalidate_cache() -> None:
    """Forget the in-process cache (tests; external file edits)."""
    global _CACHE, _DEVICE_KIND
    with _LOCK:
        _CACHE = None
        _DEVICE_KIND = None


def tune_kernels(
    sizes: Sequence[int] = (512, 1024, 2048, 4096),
    candidates: Sequence[int] = (16, 32, 64, 128),
    reps: int = 6,
    verbose: bool = True,
) -> Dict[str, int]:
    """Measure the three kernels' block-row sweet spots and cache them.

    For each image size, times every candidate block_r with interleaved
    A/B slopes (same-window comparison) for the histogram kernel, the
    fused kernel, and the radix-select byte histogram, then stores each
    winner. Returns {cache key: winning block_r}.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from rgnir_tpu.utils.microbench import chain_time_ab

    from rgnir_tpu.config import IndexKind
    from rgnir_tpu.kernels.fused import fused_analyze_pallas
    from rgnir_tpu.kernels.hist import planar_histograms_pallas
    from rgnir_tpu.kernels.select import masked_median_pallas
    from rgnir_tpu.ops.wb import wb_bounds_from_histogram

    rng = np.random.default_rng(0)
    # Tune the fused kernel at its worst-case VMEM footprint (all three
    # kinds + renders): a winner stored here must be safe for every
    # production configuration, because the cache overrides the cap.
    kinds = (IndexKind.NDVI, IndexKind.GNDVI, IndexKind.NDWI)
    winners: Dict[str, int] = {}
    for size in sizes:
        n = size * size
        img = jax.device_put(jnp.asarray(
            rng.integers(0, 256, (3, size, size), dtype=np.uint8)
        ))
        idxmap = jax.device_put(jnp.asarray(
            rng.uniform(-1, 1, (size, size)).astype(np.float32)
        ))

        def hist_body(br):
            def body(i, c):
                h = planar_histograms_pallas(c, block_r=br)
                return c ^ h[0, 0].astype(jnp.uint8)
            return body

        def fused_hist_body(br):
            # hist ON: the single-report flow; (64, n_blk) ge matrix
            # dominates VMEM, so its ceiling differs from hist-off —
            # tuned and seeded as a separate variant ("fused_hist").
            def body(i, c):
                h = planar_histograms_pallas(c)
                lo, hi = wb_bounds_from_histogram(h, n=n)
                wb, idx, rgb, st = fused_analyze_pallas(
                    c, lo, hi, kinds, block_r=br, with_hist=True
                )
                return wb
            return body

        def fused_body(br):
            # hist OFF: the batch/stream/mosaic production invocation
            # (renders + q24 round-0 + antipodal NDWI), mirroring the
            # bench config-2 step
            def body(i, c):
                h = planar_histograms_pallas(c)
                lo, hi = wb_bounds_from_histogram(h, n=n)
                out = fused_analyze_pallas(
                    c, lo, hi, kinds, block_r=br, with_hist=False,
                    with_renders=True, with_round0=True,
                    round0_digit="q24", round0_kinds=(True, True, False),
                    antipodal=(None, None, 1), with_idx_rows=True,
                )
                return out[0]
            return body

        # Mirror the PRODUCTION select: quantized q24 with the fused
        # kernel's round-0 histogram and the variance riding the tail
        # (this is the one-pass kernel when the size fits its VMEM
        # cache budget, the 3-pass kernels otherwise — the same gate
        # production hits at this size).
        key_np = np.minimum(
            np.floor((np.asarray(idxmap, np.float64) + 1.0) * 2**23),
            2**24 - 1,
        ).astype(np.int64)
        r0_np = np.bincount(
            (key_np >> 16).reshape(-1), minlength=256
        ).astype(np.int32).reshape(1, 256)
        r0_sel = jax.device_put(jnp.asarray(r0_np))
        mean_sel = jax.device_put(
            jnp.asarray(np.asarray(idxmap).mean(dtype=np.float64),
                        np.float32)
        )

        def select_body(br):
            def body(i, c):
                med, ss = masked_median_pallas(
                    c, n, reduce_ndim=2, block_r=br, quantized=True,
                    round0_hist=r0_sel, means=mean_sel,
                )
                return c + med * 0.0 + ss * 0.0
            return body

        for kernel, mk, carry in (
            ("hist", hist_body, img),
            ("fused", fused_body, img),
            ("fused_hist", fused_hist_body, img),
            ("select", select_body, idxmap),
        ):
            bodies = {}
            for br in candidates:
                if br * 1024 > 4 * n:  # absurd block for this size
                    continue
                try:
                    jax.block_until_ready(
                        jax.jit(lambda c, b=mk(br): b(0, c))(carry)
                    )
                    bodies[br] = mk(br)
                except Exception:  # noqa: BLE001 - VMEM overflow etc.
                    continue
            if not bodies:
                continue
            # Sub-0.1 ms kernels need a long iteration span or the
            # slope drowns in per-call tunnel jitter (measured: negative
            # slopes at ns=(10,60) for 512^2 kernels).
            ns = (50, 550) if n <= 2 * 1024 * 1024 else (10, 60)
            res = chain_time_ab(bodies, carry, ns=ns, reps=reps)
            best = min(res, key=res.get)
            winners[_key(kernel, n)] = best
            store_block_r(kernel, n, best)
            if verbose:
                print(json.dumps({
                    "size": size, "kernel": kernel, "winner": best,
                    "ms": {str(k): round(v, 3) for k, v in res.items()},
                }), flush=True)
    return winners

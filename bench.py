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
# the live vs_baseline ratio swing inversely; dividing by the larger of
# the PINNED best-observed value and this window's live measurement
# instead gives a contention-proof LOWER bound on the speedup (the
# denominator can only be >= whichever of the two is real right now).
_BASELINE_BEST_OBSERVED = 9.0

# Last-known-good measurement from a committed reference run (written by
# `python bench.py --record-reference` during the warmup gate). Used
# ONLY if the watchdog fires before the first live device call returns:
# the emitted value is then this number, clearly labeled
# live_measurement=false — an artifact from a stalled-tunnel window
# should say "the chip measured X when reachable", not null.
_REFERENCE_RESULT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_reference_result.json"
)

_STATE = {
    "metric": "fused WB+NDVI+stats+colormap throughput (1024^2 batch)",
    "value": None,
    "unit": "MPix/s/chip",
    "vs_baseline": None,
    "vs_baseline_conservative": None,
    "baseline_best_observed_mpix_s": _BASELINE_BEST_OBSERVED,
    "live_measurement": False,
    # Updated right before every potentially-blocking device call; if
    # the watchdog fires mid-call the JSON pinpoints the stall.
    "stall_phase": "startup",
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
        if _STATE["value"] is None:
            # No live device number landed before the deadline (tunnel
            # queued us out for the whole budget). Fall back to the
            # committed reference run, clearly labeled non-live.
            # Broad except: this runs on the WATCHDOG thread — any
            # uncaught error here (e.g. a corrupt non-dict reference
            # file) would kill the thread with _EMITTED already True
            # and no JSON ever printed, recreating the exact null-
            # record failure this path exists to eliminate.
            try:
                with open(_REFERENCE_RESULT_PATH) as f:
                    ref = json.load(f)
                v = ref.get("value")
                if v:
                    _STATE["value"] = v
                    _STATE["timing"] = "committed_reference_run"
                    _STATE["reference_run"] = ref
                    base = max(_STATE.get("baseline_mpix_s") or 0.0,
                               _BASELINE_BEST_OBSERVED)
                    _STATE["vs_baseline_conservative"] = round(v / base, 2)
                    if _STATE.get("baseline_mpix_s"):
                        _STATE["vs_baseline"] = round(
                            v / _STATE["baseline_mpix_s"], 2)
            except Exception:
                pass
        try:
            line = json.dumps(_STATE)
        except Exception:  # unserializable field must not eat the emit
            line = json.dumps({"value": _STATE.get("value"),
                               "unit": _STATE.get("unit")})
    print(line, flush=True)
    return True


def _start_watchdog(deadline: float) -> None:
    def fire():
        try:
            delay = deadline - time.monotonic()
            if delay > 0:
                time.sleep(delay)
            if _emit_and_flush():
                _log("WATCHDOG: budget exhausted — emitted best-so-far "
                     "result and exiting 0")
        finally:
            # The exit must happen no matter what the emit path did —
            # a dead watchdog thread + a tunnel-blocked main thread is
            # the unrecoverable null-record state.
            os._exit(0)

    t = threading.Thread(target=fire, daemon=True, name="bench-watchdog")
    t.start()


# ----------------------------------------------------------------------


def _update_ratios(value: float) -> None:
    """Set both speedup ratios for a new headline value: the live one
    (vs this window's measured denominator) and the conservative one
    (vs the larger of the pinned best-observed denominator and this
    window's live one — so it stays a true lower bound even if a quiet
    window measures the baseline above the pin)."""
    base = _STATE.get("baseline_mpix_s")
    if base:
        _update(vs_baseline=round(value / base, 2))
        if base > _BASELINE_BEST_OBSERVED:
            _log(f"NOTE: live baseline {base:.2f} MPix/s beats the pinned "
                 f"best-observed {_BASELINE_BEST_OBSERVED} — update "
                 f"_BASELINE_BEST_OBSERVED in bench.py")
    denom = max(base or 0.0, _BASELINE_BEST_OBSERVED)
    _update(vs_baseline_conservative=round(value / denom, 2))


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


def tunnel_probe() -> float:
    """Acquire the tunnel with the cheapest possible device call and
    time it.

    Measurement model (established with benchmarks/phase1_diag.py,
    round 5): the axon tunnel serializes tenants — a process's FIRST
    device RPC waits for the shared chip (observed 0.5 s free to 517 s
    behind another tenant's compile), after which every warm-cache
    compile (0.1 s) and execute (0.03 s) is sub-second. So the right
    structure is: pay the queue wait ONCE on a trivial op, record it as
    tunnel_probe_s, and keep every later phase cheap. The probe op's
    cache entries are part of the committed warmup set, so a warm run
    compiles nothing here.
    """
    import jax
    import jax.numpy as jnp

    _update(stall_phase="tunnel_probe")
    t0 = time.perf_counter()
    a = jax.device_put(np.zeros((8, 128), np.float32))
    b = jax.device_put(np.ones((8, 128), np.float32))
    r = jnp.add(a, b)  # first compile+execute RPC = lease acquisition
    np.asarray(r)
    dt = time.perf_counter() - t0
    _update(tunnel_probe_s=round(dt, 2))
    return dt


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
    _update(stall_phase="device_put_input")
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

    compiled = [run]  # replaced by the AOT executable after phase 1

    def timed(n: int) -> float:
        _update(stall_phase=f"run_n{n}")
        t0 = time.perf_counter()
        out = compiled[0](x, n)
        np.asarray(out[1])  # host fetch forces completion
        return time.perf_counter() - t0

    # Phase 1, DECOMPOSED (round-4 verdict item 1a). On a warm cache
    # with a free tunnel each step is sub-second (measured round 5:
    # lower 0.7 s, compile 0.14 s, first run 0.03 s); anything slow
    # here is attributable from the emitted fields:
    #   - phase1_compile_s > ~5 s  => persistent-cache MISS (stale
    #     committed cache — the remote compile queue takes minutes);
    #   - phase1_first_run_s large => chip/tunnel execute queue.
    _update(stall_phase="phase1_lower")
    _log("device phase 1: lower ...")
    t0 = time.perf_counter()
    lowered = run.lower(x, 5)
    t_lower = time.perf_counter() - t0
    _update(phase1_lower_s=round(t_lower, 2))

    _update(stall_phase="phase1_compile")
    _log(f"device phase 1: lowered in {t_lower:.2f}s; compile "
         f"(warm = cache deserialize + program load) ...")
    t0 = time.perf_counter()
    compiled[0] = lowered.compile()  # warm = deserialize + program load
    t_compile = time.perf_counter() - t0
    _update(phase1_compile_s=round(t_compile, 2))
    if t_compile > 5.0:
        _log(f"WARNING: compile took {t_compile:.1f}s — persistent-cache "
             f"MISS likely (stale .jax_cache; run `rgnir-tpu warmup`)")
    else:
        _log(f"device phase 1: compile {t_compile:.2f}s (cache hit)")

    # First execution, n=1: publishes a non-null headline from the very
    # first big-executable return (verdict item 1b). mpix/t1 includes
    # dispatch+fetch latency, so it is an honest LOWER bound; later
    # slope phases refine it.
    t1 = timed(1)
    _update(phase1_first_run_s=round(t1, 2))
    if t1 > 0:
        lb = mpix / t1
        _update(value=round(lb, 1), timing="lower_bound_first_call",
                live_measurement=True)
        _update_ratios(lb)
        _log(f"device first call: {t1:.2f}s -> provisional headline "
             f"{lb:.1f} MPix/s (lower bound incl. dispatch)")

    t5 = timed(5)
    _log(f"device phase 1 done: first_run(1) {t1:.2f}s, run(5) {t5:.2f}s")
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

    def cache_entries() -> int:
        try:
            return len(os.listdir(cache)) if cache else 0
        except OSError:
            return 0

    entries_before = cache_entries()

    # Acquire the shared tunnel with a trivial (cached) op and time the
    # wait — the single dominant warm-start term in bad windows
    # (round-5 diagnosis: 0.5 s free, 517 s queued behind a tenant).
    _log("tunnel probe (lease acquisition) ...")
    probe_s = tunnel_probe()
    _log(f"tunnel probe: {probe_s:.2f}s"
         + (" (tunnel was queued — shared-chip contention)"
            if probe_s > 10 else ""))

    dev = device_mpix_s(deadline=deadline - 10.0)
    if dev:
        _update_ratios(dev)
        _log(f"device {dev:.1f} MPix/s | numpy baseline {base:.1f} MPix/s "
             f"| vs_baseline {dev / base:.1f}x (conservative "
             f"{_STATE['vs_baseline_conservative']}x vs best-observed "
             f"baseline)")
    new_entries = cache_entries() - entries_before
    _update(new_cache_entries=new_entries)
    if new_entries > 0:
        _log(f"WARNING: device phase persisted {new_entries} new cache "
             f"entries — committed .jax_cache is stale at HEAD")

    # Reserve time for the e2e latency phase after the config table
    # (both are round-4 verdict deliverables; the table self-budgets).
    remaining = deadline - time.monotonic()
    e2e_reserve = min(100.0, max(0.0, remaining * 0.35))
    configs, skipped = full_config_table(
        deadline=deadline - 8.0 - e2e_reserve
    )
    for rec in configs:
        _log(f"config: {rec}")
    if skipped:
        _log(f"skipped configs (budget): {skipped}")
    p50 = None
    for rec in configs:
        # Config 1 is the single-image report path: its steady-state
        # ms_per_step IS the device-step p50 (excludes decode/figures);
        # the e2e phase below measures the full request latency.
        if rec.get("config") == "1_single_512_ndvi_stats":
            p50 = rec.get("ms_per_step")
    _update(configs=configs, skipped_configs=skipped,
            p50_ms_per_image_512=p50)

    # End-to-end single-image request latency (PNG -> decode -> device
    # -> stats + report files), ours vs the reference on the same files.
    _update(stall_phase="e2e_latency")
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
        import e2e_latency

        e2e = e2e_latency.measure(deadline=deadline - 6.0, log=_log)
        _update(**e2e)
    except Exception as e:  # never let the extra phase kill the record
        _log(f"e2e latency phase failed: {type(e).__name__}: {e}")
        _update(e2e_error=f"{type(e).__name__}: {e}")

    if "--record-reference" in sys.argv and _STATE.get("value"):
        with _STATE_LOCK:
            ref = {k: _STATE.get(k) for k in (
                "value", "unit", "timing", "tunnel_probe_s",
                "phase1_compile_s", "p50_ms_e2e_512")}
        try:  # keep a prior run's field when this window nulled it
            with open(_REFERENCE_RESULT_PATH) as f:
                old = json.load(f)
            for k, v in ref.items():
                if v is None and old.get(k) is not None:
                    ref[k] = old[k]
        except (OSError, ValueError):
            pass
        ref["recorded_unix"] = int(time.time())
        with open(_REFERENCE_RESULT_PATH, "w") as f:
            json.dump(ref, f, indent=1)
        _log(f"recorded reference result -> {_REFERENCE_RESULT_PATH}")

    _update(stall_phase="done")
    _emit_and_flush()


if __name__ == "__main__":
    main()

"""End-to-end single-image request latency (BASELINE.md config 1 as
written): PNG file -> decode -> device -> stats dict + report files.

Measures ``rgnir_tpu.pipeline.single.generate_ndvi_report`` (the full
reference flow: NDVI visualization figure + 50-bin histogram figure +
statistics txt, process-ndvi.py:75-110) over >= 100 warm sequential
requests and reports p50/p99 per request. The denominator is the
reference's own ``generate_ndvi_report`` (imported from
/root/reference/process-ndvi.py), timed on the SAME files.

This is the honest per-request latency the steady-state kernel-step
number (bench.py's p50_ms_per_image_512) deliberately excludes: here
every request pays file decode, host->device transfer of the image,
device math, stats fetch, and matplotlib figure composition + PNG
encode on the host.

Used by bench.py (budgeted phase) and runnable standalone:
    python benchmarks/e2e_latency.py [n_requests]
"""

from __future__ import annotations

import importlib.util
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parent.parent
if str(_ROOT) not in sys.path:
    sys.path.insert(0, str(_ROOT))

REFERENCE = Path("/root/reference/process-ndvi.py")


def _make_files(d: Path, n_files: int, size: int) -> list:
    from PIL import Image

    rng = np.random.default_rng(11)
    files = []
    for i in range(n_files):
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
        img = np.stack(
            [
                70 + 35 * np.sin(xx / 11 + i) + rng.normal(0, 10, (size, size)),
                95 + 25 * np.cos(yy / 8 + i) + rng.normal(0, 9, (size, size)),
                140 + 55 * np.sin((xx - yy) / 15 + i)
                + rng.normal(0, 14, (size, size)),
            ],
            axis=-1,
        )
        p = d / f"req_{i:02d}.png"
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(p)
        files.append(p)
    return files


def _percentiles(times_ms: list) -> tuple:
    arr = np.sort(np.asarray(times_ms))
    return (
        float(np.percentile(arr, 50)),
        float(np.percentile(arr, 99)),
    )


def measure(
    deadline: float | None = None,
    n_requests: int = 100,
    size: int = 512,
    n_files: int = 8,
    reference_requests: int = 12,
    log=lambda m: print(m, file=sys.stderr, flush=True),
) -> dict:
    """Run the e2e latency benchmark; returns a dict of results.

    ``deadline`` (time.monotonic()) trims the request counts rather
    than aborting: a noisy window yields fewer samples, never nothing.
    Request floors: 20 ours / 5 reference (below that, record skipped).
    """
    import matplotlib

    matplotlib.use("Agg")

    from rgnir_tpu.pipeline.single import generate_ndvi_report
    from rgnir_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # standalone runs must hit the warm cache

    tmp = Path(tempfile.mkdtemp(prefix="rgnir_e2e_lat_"))
    out: dict = {}
    try:
        files = _make_files(tmp, n_files, size)
        outdir = tmp / "rep"

        # Warm: device executable (persistent-cache hit), matplotlib
        # font caches, PIL decoders — all out of the timed region.
        t0 = time.perf_counter()
        generate_ndvi_report(files[0], outdir)
        warm_s = time.perf_counter() - t0
        out["e2e_warmup_s"] = round(warm_s, 2)
        log(f"e2e warmup request: {warm_s:.2f}s")

        # Ours: sequential warm requests, each fully end-to-end.
        # The warmup request is a bad cost estimate (it pays the
        # figure-cache build and any tunnel hiccup — 5+ s observed
        # where steady requests take 0.35 s), so cap the initial
        # estimate; the loop tightens it from real requests below.
        times = []
        per_req_est = min(max(warm_s * 0.8, 0.05), 1.5)
        for i in range(n_requests):
            if deadline is not None and (
                time.monotonic() + per_req_est
                > deadline - reference_requests * per_req_est * 2
            ):
                log(f"e2e: budget — stopping after {i} requests")
                break
            f = files[i % len(files)]
            t0 = time.perf_counter()
            _, stats = generate_ndvi_report(f, outdir)
            dt = time.perf_counter() - t0
            times.append(dt * 1e3)
            per_req_est = min(per_req_est, dt)
        if len(times) >= 20:
            p50, p99 = _percentiles(times)
            out["p50_ms_e2e_512"] = round(p50, 1)
            out["p99_ms_e2e_512"] = round(p99, 1)
            out["e2e_requests"] = len(times)
            log(f"e2e ours: p50 {p50:.1f} ms, p99 {p99:.1f} ms "
                f"({len(times)} requests)")
        else:
            out["e2e_requests"] = len(times)
            out["e2e_skipped"] = "too few requests fit the budget"
            return out

        # Reference denominator: same files, its own report flow. The
        # reference runs ~2x our per-request time; skip the phase
        # outright if the remaining window can't hold the warm-up plus
        # a minimum sample (its warm call has no internal deadline).
        try:
            if deadline is not None and (
                time.monotonic() + 6 * per_req_est * 2 > deadline
            ):
                out["e2e_reference_skipped"] = "budget"
                return out
            spec = importlib.util.spec_from_file_location(
                "reference_ndvi", REFERENCE
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            refdir = tmp / "ref"
            mod.generate_ndvi_report(str(files[0]), str(refdir))  # warm
            rtimes = []
            for i in range(reference_requests):
                if deadline is not None and (
                    rtimes
                    and time.monotonic() + np.median(rtimes) / 1e3 > deadline
                ):
                    break
                f = files[i % len(files)]
                t0 = time.perf_counter()
                mod.generate_ndvi_report(str(f), str(refdir))
                rtimes.append((time.perf_counter() - t0) * 1e3)
            if len(rtimes) >= 5:
                rp50 = float(np.percentile(np.sort(np.asarray(rtimes)), 50))
                out["p50_ms_e2e_512_reference"] = round(rp50, 1)
                out["e2e_reference_requests"] = len(rtimes)
                out["e2e_speedup_p50"] = round(
                    rp50 / out["p50_ms_e2e_512"], 2
                )
                log(f"e2e reference: p50 {rp50:.1f} ms "
                    f"({len(rtimes)} requests) -> speedup "
                    f"{out['e2e_speedup_p50']}x")
        except Exception as e:  # reference import must never kill bench
            out["e2e_reference_error"] = f"{type(e).__name__}: {e}"
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    print(json.dumps(measure(n_requests=n)))


if __name__ == "__main__":
    main()

"""bench.py emit-contract tests (no device work).

The driver's only perf artifact is bench.py's single JSON line; rounds
3 and 4 both shipped `value: null` when the shared-tunnel queue ate the
whole budget. These tests pin the round-5 guarantees host-side:

- the watchdog fallback emits the committed last-known-good result
  (bench_reference_result.json) labeled ``live_measurement: false``
  instead of null;
- the emit is once-only (watchdog and main path cannot both print);
- ``vs_baseline_conservative`` divides by max(live, pinned) so it
  stays a lower bound even when a quiet window measures the NumPy
  baseline above the 9.0 pin.
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture()
def bench():
    """A FRESH bench module per test (module-global _EMITTED/_STATE)."""
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", REPO / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fallback_emits_committed_reference(bench, tmp_path, capsys):
    ref = {"value": 4321.0, "unit": "MPix/s/chip",
           "timing": "min_slope_10_110_x3", "recorded_unix": 1755600000}
    p = tmp_path / "bench_reference_result.json"
    p.write_text(json.dumps(ref))
    bench._REFERENCE_RESULT_PATH = str(p)
    bench._update(baseline_mpix_s=7.5)

    assert bench._emit_and_flush() is True
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 4321.0
    assert out["timing"] == "committed_reference_run"
    assert out["live_measurement"] is False
    assert out["reference_run"]["recorded_unix"] == 1755600000
    # conservative ratio vs max(live=7.5, pinned=9.0) = 9.0
    assert out["vs_baseline_conservative"] == round(4321.0 / 9.0, 2)
    assert out["vs_baseline"] == round(4321.0 / 7.5, 2)


def test_fallback_with_corrupt_reference_file_still_emits(
    bench, tmp_path, capsys
):
    """A non-dict (corrupt/hand-edited) reference file must not kill
    the emit — on the watchdog thread an uncaught error here would end
    the process with NO JSON line (the round-3 failure mode)."""
    for i, payload in enumerate(('["not", "a", "dict"]', '"str"',
                                 '{"value": null}', "{bad json")):
        p = tmp_path / f"ref{i}.json"
        p.write_text(payload)
        b = bench if i == 0 else None
        # fresh module per payload (module-global _EMITTED)
        if b is None:
            import importlib.util

            spec = importlib.util.spec_from_file_location(
                f"bench_corrupt_{i}", REPO / "bench.py"
            )
            b = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(b)
        b._REFERENCE_RESULT_PATH = str(p)
        assert b._emit_and_flush() is True
        out = json.loads(capsys.readouterr().out.strip())
        assert out["value"] is None
        assert out.get("timing") != "committed_reference_run"


def test_fallback_without_reference_file_still_emits(bench, tmp_path,
                                                     capsys):
    bench._REFERENCE_RESULT_PATH = str(tmp_path / "missing.json")
    assert bench._emit_and_flush() is True
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] is None  # nothing to fall back to — but a line
    assert out["live_measurement"] is False


def test_emit_is_once_only(bench, tmp_path, capsys):
    bench._REFERENCE_RESULT_PATH = str(tmp_path / "missing.json")
    assert bench._emit_and_flush() is True
    assert bench._emit_and_flush() is False
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1


def test_live_value_wins_over_fallback(bench, tmp_path, capsys):
    p = tmp_path / "ref.json"
    p.write_text(json.dumps({"value": 1.0}))
    bench._REFERENCE_RESULT_PATH = str(p)
    bench._update(value=4000.0, timing="quick_slope_5_55",
                  live_measurement=True)
    bench._emit_and_flush()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 4000.0
    assert out["timing"] == "quick_slope_5_55"
    assert out["live_measurement"] is True
    assert "reference_run" not in out


def test_conservative_ratio_uses_max_of_live_and_pin(bench):
    # live baseline ABOVE the pin: conservative must use the live one
    # (otherwise "conservative" would exceed the live ratio).
    bench._update(baseline_mpix_s=12.0)
    bench._update_ratios(3600.0)
    assert bench._STATE["vs_baseline"] == 300.0
    assert bench._STATE["vs_baseline_conservative"] == 300.0
    # live baseline below the pin: conservative divides by the pin.
    bench._update(baseline_mpix_s=6.0)
    bench._update_ratios(3600.0)
    assert bench._STATE["vs_baseline"] == 600.0
    assert bench._STATE["vs_baseline_conservative"] == 400.0


def test_committed_reference_result_is_fresh():
    """bench_reference_result.json (the fallback payload) must exist
    and carry a plausible value once warmup has recorded one."""
    p = REPO / "bench_reference_result.json"
    if not p.exists():
        pytest.skip("no committed reference result yet")
    ref = json.loads(p.read_text())
    assert ref.get("value") and ref["value"] > 100.0
    assert ref.get("recorded_unix")

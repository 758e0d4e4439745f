"""Round-over-round driver bench history.

Reads every BENCH_r*.json the driver has recorded and prints one table
row per round: headline value, conservative speedup, and the round-5
diagnostic fields where present — so a reviewer can see the arc
(null -> null -> number) and what fixed it without replaying logs.

Usage: python tools/bench_history.py [--md]
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def rows():
    out = []
    for p in sorted(glob.glob(str(REPO / "BENCH_r*.json"))):
        d = json.loads(Path(p).read_text())
        parsed = d.get("parsed") or {}
        out.append({
            "round": d.get("n", Path(p).stem),
            "rc": d.get("rc"),
            "value_mpix_s": parsed.get("value"),
            "vs_conservative": parsed.get("vs_baseline_conservative"),
            "tunnel_probe_s": parsed.get("tunnel_probe_s"),
            "phase1_compile_s": parsed.get("phase1_compile_s"),
            "new_cache_entries": parsed.get("new_cache_entries"),
            "p50_ms_e2e_512": parsed.get("p50_ms_e2e_512"),
            "live": parsed.get("live_measurement"),
            "skipped_configs": len(parsed.get("skipped_configs") or []),
        })
    return out


def main() -> None:
    rs = rows()
    if "--md" in sys.argv:
        cols = ["round", "rc", "value_mpix_s", "vs_conservative",
                "tunnel_probe_s", "phase1_compile_s", "new_cache_entries",
                "p50_ms_e2e_512", "live", "skipped_configs"]
        print("| " + " | ".join(cols) + " |")
        print("|" + "---|" * len(cols))
        for r in rs:
            print("| " + " | ".join(str(r[c]) for c in cols) + " |")
    else:
        for r in rs:
            print(json.dumps(r))


if __name__ == "__main__":
    main()

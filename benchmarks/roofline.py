"""Roofline accounting for the benchmark configs (round-2 verdict #3).

For each config this derives, from the kernel structure (term-by-term,
auditable below), the HBM bytes moved per input pixel and the VPU
elementwise ops per input pixel, then combines them with the measured
throughput (BENCH_r*.json or a run_configs JSON line) into implied
bandwidth / compute rates and percent-of-peak. The point is to answer
"is it actually fast or just faster than NumPy": which resource binds,
how saturated it is, and therefore where the next optimization must go.

Peaks (TPU v5e, one chip):
  - HBM: 819 GB/s (public spec).
  - MXU: 197 TFLOP/s bf16. The one-hot contractions use it at a few
    percent; it is never the binding resource for these kernels and is
    reported only as a sanity column.
  - VPU: modeled as 8x128 lanes x 4 ALUs x ~1.75 GHz ~= 7.2e12
    elementwise ops/s. This is an architectural upper bound; real
    achievable VPU throughput on mixed compare/select/add streams is
    commonly ~half that, so the table reports utilization against BOTH
    (columns vpu%_peak and vpu%_half).

Per-pixel term derivations (see kernels/fused.py, kernels/select.py,
kernels/hist.py; K = number of index kinds, R = renders on/off):

HBM bytes/pixel (Kc = canonical kinds paying the select, 2 of 3 under
the antipodal plan):
  hist kernel        : read u8 image            -> 3
  fused kernel       : read image 3, write wb 3,
                       write index maps 4K, write renders 3K*R
  median select+tail : ONE read of the index maps -> 4Kc when the
                       one-pass kernel applies (values fit its 4 MB
                       VMEM cache: rounds 1-2 + recovery/successor/
                       variance run from VMEM,
                       kernels/select._q24_onepass_kernel); else
                       3 reads (2 q24 radix rounds + the tail kernel)
                       -> 12Kc
  bench-loop carry   : wb xor render read+write -> ~9 (renders) / ~6

VPU ops/pixel (elementwise lane ops; compares/selects/adds ~1 each):
  white balance      : ~6 per channel           -> 18
  index              : ~7 per kind              -> 7K
  stats partials     : sum/sumsq/min/max/above  -> ~10K
  50-bin histogram   : 64-edge ge matrix + row
                       reduce                   -> ~128K   (largest!)
  colormap render    : i256 + two 16-one-hots +
                       plane-sum + lo-reduce    -> ~70K * R
  median select      : key build + prefix mask +
                       byte + two 16-one-hots   -> ~45Kc * rounds
  tail kernel        : key + two masked mins +
                       centered square + sum    -> ~17Kc

Usage:
  python benchmarks/roofline.py BENCH_r03.json       # annotate a bench
  python benchmarks/roofline.py                      # latest BENCH_r*
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

HBM_PEAK = 819e9           # bytes/s
VPU_PEAK = 7.2e12          # modeled elementwise ops/s (see docstring)
MXU_PEAK = 197e12          # bf16 FLOP/s


def model(kinds: int, renders: bool, sharded: bool = False,
          hist: bool = False, onepass: bool = True):
    """(bytes/px, vpu ops/px, mxu flops/px) for one analyze step.

    Round-3 kernel structure: render_mode="planes" (one byte-plane dot
    + one lo multiply-reduce) and the quantized q24 median (2 radix
    rounds after the fused round-0, recovery+successor merged into ONE
    read). The sharded path (config 6) still runs the general f32-key
    select: 4 rounds + successor, no fused round 0. ``hist`` is
    per-config now — only the single-report flow builds the 50-bin
    histogram."""
    k, r = kinds, (1 if renders else 0)
    # Antipodal-kind plan (kernels/pipeline._median_plan): NDWI's median
    # and variance derive from GNDVI's, so for the 3-kind configs only
    # nc = 2 canonical kinds pay the select rounds and the tail pass
    # (take_prefix — skipped rows never leave HBM).
    nc = 2 if k == 3 else k
    if sharded:
        rounds, tail_vpu = 4, 3 * k  # f32 key; jnp successor
        sel_bytes = 4 * nc * rounds
    else:
        # q24 ONE-pass select (kernels/select._q24_onepass_kernel,
        # when the values fit the 4 MB VMEM cache — all table configs
        # except the 1080p/mosaic fallbacks): the index maps are read
        # from HBM ONCE; rounds 1-2 and the recovery/successor/
        # variance tail run from the VMEM cache. VPU ops are unchanged
        # vs the 3-pass path (the passes were issue-bound — measured
        # ~1% apart, BENCHMARKS.md), so `rounds` still scales the
        # one-hot op terms below while the HBM term collapses to one
        # read. Fallback (cache > 4 MB: 1080p config): 2 radix reads +
        # one tail read = 3 * 4 * nc.
        rounds, tail_vpu = 2, 17 * nc
        sel_bytes = (4 * nc) if onepass else (4 * nc * 3)
    bytes_px = (
        3                      # hist kernel image read
        + 3 + 3 + 4 * k + 3 * k * r   # fused: read, wb, idx, renders
        + sel_bytes            # select + tail HBM reads (see above)
        + (9 if renders else 6)  # bench-loop carry traffic
    )
    vpu_px = (
        18 + 7 * k + 10 * k
        + (128 * k if hist else 0)  # 50-bin exact-edge ge matrix
        + 70 * k * r           # planes render: i256 + one-hots +
                               # plane-sum + one multiply-reduce + unpack
        + (2 * nc if renders else 35 * nc)  # fused round-0: shared
                               # one-hots when rendering, else built
        + 45 * nc * rounds
        + tail_vpu
    )
    # MXU: nibble one-hot contractions. Per 16-wide dot pair: 2*16*16
    # MACs per pixel-column ~= 1024 flops/px for hist+render+select;
    # +0.5 for the fused round-0 dot.
    mxu_px = 1024.0 * k * (1.5 + r + rounds / 2)
    if sharded:
        vpu_px += 10 * k       # psum/collective epilogue (negligible)
    return bytes_px, vpu_px, mxu_px


# config name -> (kinds, renders, sharded, hist, onepass)
# onepass: model the one-pass select's single read (opt-in via
# masked_median_pallas(onepass=True)); the PRODUCTION default is the
# 3-pass path everywhere — the honest A/B measured it 0.3-0.9% faster
# (issue-bound passes hide the saved reads), so every table config
# models 3 select/tail reads.
CONFIGS = {
    "1_single_512_ndvi_stats": (1, False, False, True, False),
    "2_batch32_3idx_renders": (3, True, False, False, False),
    "3_mosaic_4096_fused": (1, True, False, False, False),
    "4_stream_1080p_3idx": (3, False, False, False, False),
    # 4b: identical per-pixel terms to 4 — the native batched layout
    # (frames stacked along the kernel row dim) moves the same bytes
    # and ops, just in one grid; only the throughput differs.
    "4b_stream_1080p_3idx_batch8": (3, False, False, False, False),
    "5_survey_8192_fused": (1, False, False, False, False),
    "6_mosaic_4096_shardmap_kernel": (1, False, True, False, False),
}


def annotate(records):
    rows = []
    for rec in records:
        name = rec.get("config")
        if name not in CONFIGS:
            continue
        kinds, renders, sharded, hist, onepass = CONFIGS[name]
        b_px, v_px, m_px = model(kinds, renders, sharded, hist,
                                 onepass=onepass)
        pix_s = rec["mpix_per_s"] * 1e6
        hbm = b_px * pix_s
        vpu = v_px * pix_s
        mxu = m_px * pix_s
        rows.append({
            "config": name,
            "mpix_s": rec["mpix_per_s"],
            "bytes_px": b_px,
            "vpu_ops_px": v_px,
            "hbm_gb_s": round(hbm / 1e9, 1),
            "hbm_pct": round(100 * hbm / HBM_PEAK, 1),
            "vpu_tops": round(vpu / 1e12, 2),
            "vpu_pct_peak": round(100 * vpu / VPU_PEAK, 1),
            "vpu_pct_half": round(100 * vpu / (VPU_PEAK / 2), 1),
            "mxu_pct": round(100 * mxu / MXU_PEAK, 1),
            "binding": (
                "VPU" if vpu / VPU_PEAK > hbm / HBM_PEAK else "HBM"
            ),
        })
    return rows


def main() -> None:
    if len(sys.argv) > 1:
        path = Path(sys.argv[1])
    else:
        candidates = sorted(glob.glob(
            str(Path(__file__).resolve().parent.parent / "BENCH_r*.json")
        ))
        if not candidates:
            raise SystemExit("no BENCH_r*.json found")
        path = Path(candidates[-1])
    data = json.loads(path.read_text())
    if isinstance(data, dict) and "parsed" in data:
        data = data["parsed"]  # driver BENCH_r*.json wrapper
    records = data["configs"] if isinstance(data, dict) else data
    rows = annotate(records)
    print(f"# roofline vs {path.name}")
    hdr = ("| config | MPix/s | B/px | VPUops/px | HBM GB/s (%) | "
           "VPU Top/s (%peak / %half) | MXU % | binding |")
    print(hdr)
    print("|" + "---|" * 8)
    for r in rows:
        print(
            f"| {r['config']} | {r['mpix_s']} | {r['bytes_px']} | "
            f"{r['vpu_ops_px']} | {r['hbm_gb_s']} ({r['hbm_pct']}%) | "
            f"{r['vpu_tops']} ({r['vpu_pct_peak']}% / {r['vpu_pct_half']}%) | "
            f"{r['mxu_pct']}% | {r['binding']} |"
        )


if __name__ == "__main__":
    main()

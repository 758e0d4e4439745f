"""On-device kernel self-test (Mosaic compile + value checks).

Interpret-mode tests passing does NOT prove a kernel compiles under
real Mosaic (hard-won: int8 one-hots and i1->bf16 selects pass
interpret and HTTP-500 on the chip). This script drives every Pallas
kernel on the attached device against its jnp/numpy reference at
awkward (padded/ragged) shapes and prints one JSON line per check.

Run after ANY kernel edit, on any new device generation, or after a
jax upgrade:  ``rgnir-tpu selftest``  (or
``python tools/tpu_parity_probe.py`` from a source checkout). The
first run on a device recompiles every kernel; the persistent
compilation cache makes reruns fast.
"""

from __future__ import annotations

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

FAILURES = []


def check(name: str, ok: bool, detail: str = "") -> None:
    print(json.dumps({"check": name, "ok": bool(ok), "detail": detail}),
          flush=True)
    if not ok:
        FAILURES.append(name)


def main() -> int:
    from rgnir_tpu.utils import enable_compilation_cache

    # Machine-local cache, NOT the repo-committed artifact: selftest
    # compiles every kernel at deliberately awkward one-off shapes that
    # no production path ever loads (one run persisted 206 entries into
    # .jax_cache before this). A re-run on the same machine still hits
    # this dir. RGNIR_COMPILE_CACHE_DIR still overrides (empty value =
    # cache disabled, same contract as enable_persistent_cache).
    import os

    from rgnir_tpu.utils.compile_cache import machine_local_cache_dir

    env = os.environ.get("RGNIR_COMPILE_CACHE_DIR")
    if env is None:
        enable_compilation_cache(machine_local_cache_dir("selftest"))
    elif env:
        enable_compilation_cache(env)
    FAILURES.clear()
    rng = np.random.default_rng(7)
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    from rgnir_tpu.kernels import (
        fused_analyze_pallas,
        masked_median_pallas,
        planar_histograms_pallas,
        radix_order_statistic_pallas,
    )
    from rgnir_tpu.ops.histogram import planar_histograms
    from rgnir_tpu.ops.wb import wb_bounds_from_histogram

    # 1. histogram kernel, unaligned shape
    img = jnp.asarray(rng.integers(0, 256, (3, 307, 450), dtype=np.uint8))
    got = np.asarray(planar_histograms_pallas(img))
    want = np.asarray(planar_histograms(img))
    check("hist_unaligned", np.array_equal(got, want))

    # 2. fused kernel vs jnp pipeline stats (exact integer outputs)
    from rgnir_tpu.pipeline.fused import analyze_image
    from rgnir_tpu.kernels.pipeline import analyze_image_kernel

    hwc = jnp.asarray(rng.integers(0, 256, (301, 517, 3), dtype=np.uint8))
    rk = analyze_image_kernel(hwc, kinds=("NDVI", "NDWI"))
    rj = analyze_image(hwc, kinds=("NDVI", "NDWI"))
    for kind in ("NDVI", "NDWI"):
        sk, sj = rk.stats[kind], rj.stats[kind]
        check(
            f"fused_{kind}",
            np.array_equal(np.asarray(sk.histogram), np.asarray(sj.histogram))
            and float(sk.median) == float(sj.median)
            and abs(float(sk.mean) - float(sj.mean)) < 1e-6
            and np.array_equal(np.asarray(rk.renders[kind]),
                               np.asarray(rj.renders[kind])),
        )
    check("fused_wb_bytes",
          np.array_equal(np.asarray(rk.wb), np.asarray(rj.wb)))

    # 2a2. exactly grid-aligned shape: the fused kernel's positional
    # mask is statically ELIDED (fused.py all_valid) — this is the
    # bench/production 512^2-class path; verify it against the jnp
    # pipeline on real silicon (CPU tests pin bit-parity vs the
    # masked form, but only a device run proves Mosaic compiles it).
    hwc_a = jnp.asarray(rng.integers(0, 256, (512, 512, 3),
                                     dtype=np.uint8))
    rka = analyze_image_kernel(hwc_a, kinds=("NDVI",))
    rja = analyze_image(hwc_a, kinds=("NDVI",))
    check(
        "fused_aligned_allvalid",
        float(rka.stats["NDVI"].median) == float(rja.stats["NDVI"].median)
        and abs(float(rka.stats["NDVI"].mean)
                - float(rja.stats["NDVI"].mean)) < 1e-6
        and np.array_equal(np.asarray(rka.renders["NDVI"]),
                           np.asarray(rja.renders["NDVI"])),
    )

    # 2b. batched 3-kind run: exercises the NATIVE batched layout
    # (frames stacked along the kernel row dim, per-frame accumulator
    # blocks — kernels/fused.py ``spf``), the antipodal median plan
    # (NDWI derived from GNDVI — round0_kinds skip in the fused kernel
    # + the select's prefix take over kind-major idx_rows), and the
    # batched reassembly (wb/render/index slicing), all on real Mosaic.
    bhwc = jnp.asarray(rng.integers(0, 256, (3, 161, 253, 3),
                                    dtype=np.uint8))
    rbk = analyze_image_kernel(bhwc, kinds=("NDVI", "GNDVI", "NDWI"))
    rbj = analyze_image(bhwc, kinds=("NDVI", "GNDVI", "NDWI"))
    check(
        "antipodal_medians",
        all(
            np.array_equal(np.asarray(rbk.stats[kd].median),
                           np.asarray(rbj.stats[kd].median))
            and np.allclose(np.asarray(rbk.stats[kd].std),
                            np.asarray(rbj.stats[kd].std), atol=1e-6)
            for kd in ("NDVI", "GNDVI", "NDWI")
        ),
    )
    check(
        "batched_native_assembly",
        np.array_equal(np.asarray(rbk.wb), np.asarray(rbj.wb))
        and all(
            np.array_equal(np.asarray(rbk.renders[kd]),
                           np.asarray(rbj.renders[kd]))
            and np.array_equal(np.asarray(rbk.indices[kd]),
                               np.asarray(rbj.indices[kd]))
            and np.array_equal(np.asarray(rbk.stats[kd].histogram),
                               np.asarray(rbj.stats[kd].histogram))
            for kd in ("NDVI", "GNDVI", "NDWI")
        ),
    )
    # 2c. batched + grid-aligned (512^2): the all_valid mask elision
    # combined with the per-frame spf layout — the config-2/4b
    # production shape class.
    bhwc_a = jnp.asarray(rng.integers(0, 256, (4, 512, 512, 3),
                                      dtype=np.uint8))
    rba = analyze_image_kernel(bhwc_a, kinds=("NDVI", "GNDVI", "NDWI"))
    rba1 = analyze_image_kernel(bhwc_a[2], kinds=("NDVI", "GNDVI", "NDWI"))
    check(
        "batched_aligned_vs_single",
        all(
            float(np.asarray(rba.stats[kd].median)[2])
            == float(rba1.stats[kd].median)
            and float(np.asarray(rba.stats[kd].mean)[2])
            == float(rba1.stats[kd].mean)
            for kd in ("NDVI", "GNDVI", "NDWI")
        )
        and np.array_equal(np.asarray(rba.renders["NDWI"][2]),
                           np.asarray(rba1.renders["NDWI"])),
    )
    rdots = fused_analyze_pallas(
        jnp.moveaxis(hwc, -1, -3),
        *wb_bounds_from_histogram(
            planar_histograms(jnp.moveaxis(hwc, -1, -3)), n=301 * 517
        ),
        ("NDVI", "NDWI"), render_mode="dots",
    )
    for mode in ("packed_mr", "planes"):
        rpm = fused_analyze_pallas(
            jnp.moveaxis(hwc, -1, -3),
            *wb_bounds_from_histogram(
                planar_histograms(jnp.moveaxis(hwc, -1, -3)), n=301 * 517
            ),
            ("NDVI", "NDWI"), render_mode=mode,
        )
        check(
            f"render_{mode}_exact",
            np.array_equal(np.asarray(rpm[2]), np.asarray(rdots[2])),
        )

    # 3. select kernel: median + arbitrary rank vs numpy
    x = rng.normal(size=4999).astype(np.float32)
    check("median_odd",
          float(masked_median_pallas(jnp.asarray(x), 4999)) ==
          float(np.median(x)))
    x2 = rng.choice([-1.0, 0.0, 0.0, 0.5], size=5000).astype(np.float32)
    check("median_even_ties",
          float(masked_median_pallas(jnp.asarray(x2), 5000)) ==
          float(np.median(x2)))
    r = 1234
    check("rank_select",
          float(radix_order_statistic_pallas(jnp.asarray(x), r)) ==
          float(np.sort(x)[r]))
    # quantized (q24) select on index-like values (uint8 band pairs,
    # heavy ties), odd and even n — the pipeline's production path
    av = rng.integers(0, 256, 5000).astype(np.float32)
    bv = rng.integers(0, 256, 5000).astype(np.float32)
    av[:1200] = bv[:1200] = 7.0
    vq = np.clip(
        (av - bv) / (av + bv + np.float32(1e-10)), -1.0, 1.0
    ).astype(np.float32)
    check("median_quantized_even",
          float(masked_median_pallas(jnp.asarray(vq), 5000,
                                     quantized=True)) ==
          float(np.median(vq)))
    check("median_quantized_odd",
          float(masked_median_pallas(jnp.asarray(vq[:4999]), 4999,
                                     quantized=True)) ==
          float(np.median(vq[:4999])))
    # ONE-pass q24 select (round0_hist + VMEM cache) at 512^2: bin
    # counts here exceed bf16's exact-integer range, which the CPU
    # interpret tests cannot see — a default-precision MXU dot in the
    # in-kernel cdf pick silently truncated counts ~1156 on real
    # Mosaic (caught 2026-08-18; fixed with Precision.HIGHEST).
    n1 = 512 * 512
    a1 = rng.integers(0, 256, (2, n1)).astype(np.float32)
    b1 = rng.integers(0, 256, (2, n1)).astype(np.float32)
    v1 = np.clip(
        (a1 - b1) / (a1 + b1 + np.float32(1e-10)), -1.0, 1.0
    ).astype(np.float32)
    k1 = np.minimum(
        np.floor((v1.astype(np.float64) + 1.0) * 2**23), 2**24 - 1
    ).astype(np.int64)
    r0_1 = np.stack(
        [np.bincount(r >> 16, minlength=256) for r in k1]
    ).astype(np.int32)
    m1, s1 = masked_median_pallas(
        jnp.asarray(v1), n1, quantized=True, onepass=True,
        round0_hist=jnp.asarray(r0_1),
        means=jnp.asarray(v1.mean(axis=-1, dtype=np.float64)
                          .astype(np.float32)),
    )
    check("median_q24_onepass_bigcounts",
          np.array_equal(np.asarray(m1),
                         np.median(v1, axis=-1).astype(np.float32)))

    # 4. sharded (shard_map) kernel bodies on a 1-device mesh: ragged
    # rows exercise the traced-SMEM n_live; 2-D exercises the
    # rectangular-validity select.
    from rgnir_tpu.parallel import analyze_mosaic
    from rgnir_tpu.parallel.mesh import local_mesh, make_mesh

    mosaic = jnp.asarray(rng.integers(0, 256, (1027, 1022, 3),
                                      dtype=np.uint8))
    mk = analyze_mosaic(mosaic, kinds=("NDVI",), mesh=local_mesh(),
                        impl="kernel")
    mj = analyze_mosaic(mosaic, kinds=("NDVI",), mesh=local_mesh(),
                        impl="jnp")
    check("mosaic_1d_kernel_vs_jnp",
          float(mk.stats["NDVI"].median) == float(mj.stats["NDVI"].median)
          and np.array_equal(np.asarray(mk.stats["NDVI"].histogram),
                             np.asarray(mj.stats["NDVI"].histogram)))
    mesh2 = make_mesh((1, 1), ("dr", "dc"))
    m2k = analyze_mosaic(mosaic, kinds=("NDVI",), mesh=mesh2,
                         impl="kernel")
    check("mosaic_2d_kernel_vs_1d",
          float(m2k.stats["NDVI"].median) == float(mk.stats["NDVI"].median))

    # 5. sharded change detection (Pallas select inside the shard body)
    from rgnir_tpu.parallel import change_detection_mosaic

    early = np.asarray(mosaic)
    late = np.roll(early, (4, -3), axis=(0, 1))
    ch = change_detection_mosaic(
        jnp.asarray(early), jnp.asarray(late), "NDVI",
        mesh=local_mesh(), halo=16, proxy_stride=1,
    )
    dy, dx = (float(s) for s in np.asarray(ch.shift))
    check("sharded_change_shift", (dy, dx) == (-4.0, 3.0),
          f"shift=({dy},{dx})")
    # Non-rigid refinement compiles and locks on-device: a rigidly
    # rolled pair must recover a near-constant field == -roll (the
    # per-tile batched FFTs, the field all_gather, and the per-pixel
    # field_warp_haloed gather path all run on real silicon here).
    chf = change_detection_mosaic(
        jnp.asarray(early), jnp.asarray(late), "NDVI",
        mesh=local_mesh(), halo=16, proxy_stride=1,
        local_tile=(64, 64),
    )
    fld = np.asarray(chf.field)
    check(
        "sharded_change_local_field",
        fld.shape[-1] == 2
        and not bool(chf.field_saturated)
        and np.abs(fld[1:-1] - np.float32([-4.0, 3.0])).max() <= 1.0,
        f"field_range=({fld.min()},{fld.max()})",
    )

    print(json.dumps({
        "result": "PASS" if not FAILURES else "FAIL",
        "failures": FAILURES,
    }), flush=True)
    return 1 if FAILURES else 0


if __name__ == "__main__":
    sys.exit(main())

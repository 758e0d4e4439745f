"""Pallas kernel parity tests (interpret mode on CPU) vs the jnp ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgnir_tpu.kernels import fused_analyze_pallas, planar_histograms_pallas
from rgnir_tpu.kernels.fused import S_ABOVE, S_HIST, S_MAX, S_MIN, S_SUM, S_SUMSQ
from rgnir_tpu.ops.histogram import planar_histograms
from rgnir_tpu.ops.wb import wb_bounds_from_histogram
from rgnir_tpu.pipeline.fused import analyze_image

import golden


@pytest.fixture
def planar_image(rgnir_image):
    return jnp.moveaxis(jnp.asarray(rgnir_image), -1, -3)  # (3, 96, 128)


class TestHistKernel:
    def test_parity_exact(self, planar_image):
        got = np.asarray(planar_histograms_pallas(planar_image, block_r=8))
        want = np.asarray(planar_histograms(planar_image))
        np.testing.assert_array_equal(got, want)

    def test_unaligned_shapes(self, rng):
        """H not a block multiple, W not a lane multiple: padding must be
        masked out of the counts."""
        img = jnp.asarray(
            rng.integers(0, 256, (3, 37, 90), dtype=np.uint8)
        )
        got = np.asarray(planar_histograms_pallas(img, block_r=4))
        want = np.asarray(planar_histograms(img))
        np.testing.assert_array_equal(got, want)
        assert got.sum() == 3 * 37 * 90

    def test_batched(self, rng):
        imgs = jnp.asarray(rng.integers(0, 256, (2, 3, 24, 128), dtype=np.uint8))
        got = np.asarray(planar_histograms_pallas(imgs, block_r=2))
        want = np.asarray(planar_histograms(imgs))
        np.testing.assert_array_equal(got, want)


class TestSelectKernel:
    def test_order_statistic_parity(self, rng):
        from rgnir_tpu.kernels.select import radix_order_statistic_pallas

        x = rng.normal(size=(3, 1000)).astype(np.float32)
        for rank in (0, 17, 499, 999):
            got = np.asarray(
                radix_order_statistic_pallas(jnp.asarray(x), rank, block_r=4)
            )
            want = np.sort(x, axis=1)[:, rank]
            np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("n", [999, 1000, 4096])
    def test_median_parity(self, rng, n):
        # n=4096 with block_r=4 is exactly lane- AND block-aligned:
        # the kernels' positional masks are statically elided
        # (select._no_padding) — same result, fewer ops.
        from rgnir_tpu.kernels.select import masked_median_pallas

        x = rng.normal(size=n).astype(np.float32)
        got = float(masked_median_pallas(jnp.asarray(x), n, block_r=4))
        assert got == float(np.median(x))

    def test_median_ties(self, rng):
        from rgnir_tpu.kernels.select import masked_median_pallas

        y = rng.choice([0.0, 0.25, -0.5, 1.0], size=512).astype(np.float32)
        got = float(masked_median_pallas(jnp.asarray(y), 512, block_r=2))
        assert got == float(np.median(y))


class TestFusedKernel:
    def test_full_parity(self, rgnir_image, planar_image):
        hist = planar_histograms(planar_image)
        h, w = rgnir_image.shape[:2]
        lo, hi = wb_bounds_from_histogram(hist, n=h * w)
        kinds = ("NDVI", "NDWI")
        wb, idx, rgb, stats = fused_analyze_pallas(
            planar_image, lo, hi, kinds, block_r=8
        )
        ref = analyze_image(jnp.asarray(rgnir_image), kinds=kinds)

        np.testing.assert_array_equal(
            np.moveaxis(np.asarray(wb), 0, -1), np.asarray(ref.wb)
        )
        for k, kind in enumerate(kinds):
            np.testing.assert_allclose(
                np.asarray(idx[k]), np.asarray(ref.indices[kind]),
                atol=1.2e-7, rtol=0,
            )
            np.testing.assert_array_equal(
                np.moveaxis(np.asarray(rgb[k]), 0, -1),
                np.asarray(ref.renders[kind]),
            )
            st = ref.stats[kind]
            s = np.asarray(stats[k])
            n = h * w
            assert s[S_SUM] / n == pytest.approx(float(st.mean), abs=1e-5)
            assert float(s[S_SUMSQ]) / n - (s[S_SUM] / n) ** 2 == pytest.approx(
                float(st.std) ** 2, abs=1e-4
            )
            assert s[S_MIN] == float(st.min)
            assert s[S_MAX] == float(st.max)
            assert s[S_ABOVE] == pytest.approx(
                float(st.coverage_pct) * n / 100.0, abs=0.5
            )
            np.testing.assert_array_equal(
                s[S_HIST:S_HIST + 50].astype(np.int64),
                np.asarray(st.histogram),
            )

    def test_render_modes_identical(self, rng):
        """The packed-LUT render (one HIGHEST-precision contraction of
        a 24-bit-int packed table + lo-nibble select tree) must be
        bit-identical to the original three-per-channel-dot path at an
        unaligned shape. Real-Mosaic exactness of the packed dot is
        probed by benchmarks/exp_render.py and rgnir-tpu selftest."""
        img = jnp.asarray(
            rng.integers(0, 256, (3, 97, 333), dtype=np.uint8)
        )
        hist = planar_histograms(img)
        lo, hi = wb_bounds_from_histogram(hist, n=97 * 333)
        kinds = ("NDVI", "GNDVI", "NDWI")
        outs = {
            mode: fused_analyze_pallas(
                img, lo, hi, kinds, block_r=8, render_mode=mode
            )
            for mode in ("packed", "dots", "tree", "packed_mr", "planes")
        }
        for mode in ("packed", "tree", "packed_mr", "planes"):
            for a, b in zip(outs[mode], outs["dots"]):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("batched", [False, True])
    def test_packed_out_parity(self, rng, batched):
        """packed_out=True (one i32 ``r|g<<8|b<<16`` store per pixel +
        bitcast HWC recovery) must be bitwise identical to the planar
        u8 path across wb, indices, renders, and stats."""
        from rgnir_tpu.kernels.pipeline import analyze_image_kernel

        shape = (2, 65, 197, 3) if batched else (65, 197, 3)
        img = jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
        kinds = ("NDVI", "NDWI")
        a = analyze_image_kernel(img, kinds=kinds, packed_out=True)
        b = analyze_image_kernel(img, kinds=kinds, packed_out=False)
        np.testing.assert_array_equal(np.asarray(a.wb), np.asarray(b.wb))
        for k in kinds:
            np.testing.assert_array_equal(
                np.asarray(a.indices[k]), np.asarray(b.indices[k])
            )
            np.testing.assert_array_equal(
                np.asarray(a.renders[k]), np.asarray(b.renders[k])
            )
            for f in ("mean", "median", "min", "max", "std"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(a.stats[k], f)),
                    np.asarray(getattr(b.stats[k], f)),
                )

    def test_q24_key_separates_all_index_values(self):
        """Exactness precondition of the quantized (q24) median select:
        over ALL 65536 (a, b) uint8 band pairs, the 24-bit key
        ``min(floor((v+1)*2^23), 2^24-1)`` of the f32 index value
        ``clip((a-b)/(a+b+1e-10))`` must be monotone in the value and
        distinct for distinct values — so the winning key bin always
        holds exactly one distinct value and ``kv > kp`` is exactly
        ``v > lo`` (kernels/select.py masked_median_pallas quantized)."""
        from rgnir_tpu.config import EPSILON

        a, b = np.meshgrid(
            np.arange(256, dtype=np.float32),
            np.arange(256, dtype=np.float32),
        )
        v = np.clip(
            (a - b).astype(np.float32)
            / (a + b + np.float32(EPSILON)).astype(np.float32),
            np.float32(-1.0), np.float32(1.0),
        ).astype(np.float32).ravel()
        key = np.minimum(
            ((v + np.float32(1.0)) * np.float32(2.0**23)).astype(np.int64),
            2**24 - 1,
        )
        order = np.argsort(v, kind="stable")
        vs, ks = v[order], key[order]
        assert (np.diff(ks) >= 0).all()            # monotone
        dv = np.diff(vs) != 0
        assert (np.diff(ks)[dv] > 0).all()         # distinct v -> distinct key
        # and the margin claimed in the docstring holds
        assert np.min(np.diff(vs)[dv]) > 2.0**-19

    def test_quantized_median_parity_adversarial(self):
        """masked_median_pallas(quantized=True) == np.median on
        index-like data built from uint8 band pairs: heavy ties
        (constant regions), clip-edge values, even and odd n."""
        from rgnir_tpu.config import EPSILON
        from rgnir_tpu.kernels.select import masked_median_pallas

        rng = np.random.default_rng(11)
        for n in (4999, 5000, 4096):
            a = rng.integers(0, 256, n).astype(np.float32)
            b = rng.integers(0, 256, n).astype(np.float32)
            # force ties and clip edges
            a[: n // 4] = 7.0
            b[: n // 4] = 7.0
            a[n // 4: n // 3] = 255.0
            b[n // 4: n // 3] = 0.0
            v = np.clip(
                (a - b) / (a + b + np.float32(EPSILON)), -1.0, 1.0
            ).astype(np.float32)
            got = float(masked_median_pallas(
                jnp.asarray(v), n, quantized=True
            ))
            assert got == float(np.median(v)), n

    def test_antipodal_in_kernel_derivation(self, rng):
        """fused_analyze_pallas(antipodal=...) must produce bit-equal
        wb/idx/renders/r0 to the independent computation, and the
        derived kind's skipped sum/sumsq/min/max must be exactly the
        negation of the partner's (f32 negation commutes with every
        reduction add)."""
        from rgnir_tpu.config import IndexKind
        from rgnir_tpu.kernels.fused import (
            S_MAX, S_MIN, S_SUM, S_SUMSQ, fused_analyze_pallas,
        )
        from rgnir_tpu.kernels.hist import planar_histograms_pallas
        from rgnir_tpu.ops.wb import wb_bounds_from_histogram

        kinds = (IndexKind.NDVI, IndexKind.GNDVI, IndexKind.NDWI)
        img = jnp.asarray(rng.integers(0, 256, (3, 97, 213), dtype=np.uint8))
        hist = planar_histograms_pallas(img)
        lo, hi = wb_bounds_from_histogram(hist, n=97 * 213)
        kw = dict(with_renders=True, with_round0=True, with_hist=True,
                  round0_digit="q24", round0_kinds=(True, True, False),
                  block_r=8)
        a = fused_analyze_pallas(img, lo, hi, kinds, **kw)
        b = fused_analyze_pallas(
            img, lo, hi, kinds, antipodal=(None, None, 1), **kw
        )
        for name, i in (("wb", 0), ("idx", 1), ("render", 2), ("r0", 4)):
            np.testing.assert_array_equal(
                np.asarray(a[i]), np.asarray(b[i]), err_msg=name
            )
        sa, sb = np.asarray(a[3]), np.asarray(b[3])
        np.testing.assert_array_equal(sa[:2], sb[:2])  # canonical rows
        # derived row: coverage + histogram lanes identical ...
        np.testing.assert_array_equal(sa[2, 4:], sb[2, 4:])
        # ... and the skipped lanes are exact negations of GNDVI's
        assert sb[2, S_SUM] == 0.0 and sb[2, S_SUMSQ] == 0.0
        assert sa[2, S_SUM] == -sa[1, S_SUM]
        assert sa[2, S_MIN] == -sa[1, S_MAX]
        assert sa[2, S_MAX] == -sa[1, S_MIN]
        with pytest.raises(ValueError, match="earlier kind"):
            fused_analyze_pallas(
                img, lo, hi, kinds, antipodal=(None, 2, None), **kw
            )

    def test_q24_onepass_matches_threepass(self, rng):
        """The one-pass q24 select (round0_hist + VMEM cache,
        kernels/select._q24_onepass_kernel) must be bit-identical to
        the 3-pass path on the same inputs — medians AND the tail's
        centered sumsq — at odd and even n, with and without
        take_prefix."""
        from rgnir_tpu.config import EPSILON
        from rgnir_tpu.kernels.select import masked_median_pallas

        for n in (3000, 4097):
            a = rng.integers(0, 256, (2, 3, n)).astype(np.float32)
            b = rng.integers(0, 256, (2, 3, n)).astype(np.float32)
            v = np.clip(
                (a - b) / (a + b + np.float32(EPSILON)), -1.0, 1.0
            ).astype(np.float32)
            means = v.mean(axis=-1, dtype=np.float64).astype(np.float32)
            key = np.minimum(
                np.floor((v.astype(np.float64) + 1.0) * 2**23), 2**24 - 1
            ).astype(np.int64)
            r0 = np.stack(
                [np.bincount(row >> 16, minlength=256)
                 for row in key.reshape(-1, n)]
            ).astype(np.int32).reshape(2, 3, 256)
            for tp, mslice in (((3, 2), np.s_[:, :2]), (None, np.s_[:])):
                kw = dict(n_valid=n, quantized=True, take_prefix=tp,
                          means=jnp.asarray(means[mslice]))
                r0k = jnp.asarray(
                    r0[mslice] if tp is not None else r0
                )
                med1, ss1 = masked_median_pallas(
                    jnp.asarray(v), round0_hist=r0k, onepass=True, **kw
                )
                # Force the 3-pass path on identical inputs via the
                # EXPLICIT override (A/B by patching the budget
                # constant silently reuses cached traces — the
                # exp_onepass.py lesson).
                med3, ss3 = masked_median_pallas(
                    jnp.asarray(v), round0_hist=r0k, onepass=False, **kw
                )
                np.testing.assert_array_equal(
                    np.asarray(med1), np.asarray(med3), err_msg=f"{n} {tp}"
                )
                np.testing.assert_array_equal(
                    np.asarray(ss1), np.asarray(ss3), err_msg=f"{n} {tp}"
                )
                np.testing.assert_array_equal(
                    np.asarray(med1),
                    np.median(v[mslice], axis=-1).astype(np.float32),
                    err_msg=f"{n} {tp}",
                )

    def test_all_valid_elision_bit_parity(self, rng):
        """At exactly grid-aligned shapes the wrapper proves no padding
        exists and the kernel elides its positional mask; outputs must
        be bitwise identical to the masked form (forced by passing
        n_valid as a traced scalar, which defeats the static proof)."""
        from rgnir_tpu.kernels.hist import planar_histograms_pallas
        from rgnir_tpu.ops.wb import wb_bounds_from_histogram

        img = jnp.asarray(
            rng.integers(0, 256, (3, 128, 512), dtype=np.uint8)
        )  # 65536 px = 64 rows: lane- and block-aligned at block_r=8
        hist = planar_histograms_pallas(img)
        lo, hi = wb_bounds_from_histogram(hist, n=128 * 512)
        kinds = ("NDVI", "GNDVI", "NDWI")
        kw = dict(with_renders=True, with_round0=True, with_hist=True,
                  round0_digit="q24", round0_kinds=(True, True, False),
                  antipodal=(None, None, 1), block_r=8)
        a = fused_analyze_pallas(img, lo, hi, kinds, **kw)
        b = fused_analyze_pallas(
            img, lo, hi, kinds, n_valid=jnp.int32(128 * 512), **kw
        )
        for name, i in (("wb", 0), ("idx", 1), ("render", 2),
                        ("stats", 3), ("r0", 4)):
            np.testing.assert_array_equal(
                np.asarray(a[i]), np.asarray(b[i]), err_msg=name
            )

    def test_pad_zero_elision_bit_parity(self, rng):
        """At NON-aligned shapes (tail padding exists) the wrapper now
        proves the pads are zero bytes and elides the positional mask
        anyway (kernels/fused.py pad_zero): sums/coverage are untouched
        (idx_pad == 0.0 is neutral), histogram/round-0 counts are
        corrected by the statically-known pad contribution, and min/max
        re-reduce under the mask only in each frame's last block.
        Outputs must be bitwise identical to the masked form (forced by
        a traced n_valid, which defeats every static proof)."""
        from rgnir_tpu.kernels.hist import planar_histograms_pallas
        from rgnir_tpu.ops.wb import wb_bounds_from_histogram

        img = jnp.asarray(
            rng.integers(0, 256, (3, 41, 77), dtype=np.uint8)
        )  # 3157 px: lane- AND block-padded
        hist = planar_histograms_pallas(img)
        lo, hi = wb_bounds_from_histogram(hist, n=41 * 77)
        kinds = ("NDVI", "GNDVI", "NDWI")
        kw = dict(with_renders=True, with_round0=True, with_hist=True,
                  round0_digit="q24", round0_kinds=(True, True, False),
                  antipodal=(None, None, 1), block_r=2)
        a = fused_analyze_pallas(img, lo, hi, kinds, **kw)
        b = fused_analyze_pallas(
            img, lo, hi, kinds, n_valid=jnp.int32(41 * 77), **kw
        )
        for name, i in (("wb", 0), ("idx", 1), ("render", 2),
                        ("stats", 3), ("r0", 4)):
            np.testing.assert_array_equal(
                np.asarray(a[i]), np.asarray(b[i]), err_msg=name
            )
        # all-positive indices: the pads' 0.0 must NOT leak into min.
        # Identity bounds (lo=0, hi=255) keep wb == input, so red in
        # [1, 50] and nir in [200, 255] make every valid NDVI strictly
        # positive while the zero pads still map to idx == 0.0.
        img2 = jnp.stack([
            jnp.asarray(rng.integers(1, 51, (41, 77), dtype=np.uint8)),
            jnp.asarray(rng.integers(0, 256, (41, 77), dtype=np.uint8)),
            jnp.asarray(rng.integers(200, 256, (41, 77), dtype=np.uint8)),
        ])
        sa = fused_analyze_pallas(
            img2, jnp.zeros(3), jnp.full(3, 255.0), ("NDVI",), block_r=2
        )[3]
        from rgnir_tpu.kernels.fused import S_MAX, S_MIN
        assert float(sa[0, S_MIN]) > 0.0, float(sa[0, S_MIN])
        assert float(sa[0, S_MAX]) > 0.0

    def test_pad_zero_round0_key_derived_kind(self, rng):
        """Regression (round-3 review): with round0_digit="key" a
        DERIVED antipodal kind's pads are -0.0, whose f32 bit-key top
        byte is 127 (~0x80000000 >> 24) — not +0.0's 128 — so the
        pad_zero round-0 correction must subtract the pad count from
        byte 127 for derived kinds. Force round0_kinds all-True so the
        derived kind emits round 0, at a tail-padded shape."""
        from rgnir_tpu.kernels.hist import planar_histograms_pallas
        from rgnir_tpu.ops.wb import wb_bounds_from_histogram

        img = jnp.asarray(
            rng.integers(0, 256, (3, 41, 77), dtype=np.uint8)
        )
        hist = planar_histograms_pallas(img)
        lo, hi = wb_bounds_from_histogram(hist, n=41 * 77)
        kinds = ("GNDVI", "NDWI")
        kw = dict(with_renders=False, with_round0=True, with_hist=False,
                  round0_digit="key", round0_kinds=(True, True),
                  antipodal=(None, 0), block_r=2)
        a = fused_analyze_pallas(img, lo, hi, kinds, **kw)
        masked = fused_analyze_pallas(
            img, lo, hi, kinds, n_valid=jnp.int32(41 * 77), **kw
        )
        np.testing.assert_array_equal(
            np.asarray(a[-1]), np.asarray(masked[-1]), err_msg="r0"
        )

    def test_pad_zero_traced_bounds_disabled(self, rng):
        """Regression (round-3 review): traced WB bounds make the
        lo >= 0 precondition unprovable, so pad_zero must stay OFF
        unless the caller asserts bounds_nonneg=True — a traced
        NEGATIVE lo would white-balance the zero-byte pads to > 0 and
        silently corrupt the stats. With the guard, results under jit
        with negative lo match the explicitly masked form."""
        img = jnp.asarray(
            rng.integers(0, 256, (3, 41, 77), dtype=np.uint8)
        )
        lo = jnp.asarray([-10.0, 0.0, 0.0])
        hi = jnp.full(3, 255.0)

        @jax.jit
        def run(im, lo_, hi_):
            return fused_analyze_pallas(
                im, lo_, hi_, ("NDVI",), block_r=2, with_renders=False,
                with_hist=True,
            )[3]

        got = run(img, lo, hi)
        want = fused_analyze_pallas(
            img, jnp.asarray(lo), hi, ("NDVI",), block_r=2,
            with_renders=False, with_hist=True,
            n_valid=jnp.int32(41 * 77),
        )[3]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_rows_select_block_fallback_odd_rows(self, rng):
        """Regression (round-3 review): masked_median_pallas_rows'
        block fallback must produce a Mosaic-legal block (multiple of
        8 dividing R, or R itself) — R=40 with a preferred block of 16
        used to fall back to 10 and fail TPU lowering; odd R (e.g.
        2025-like) must fall back to R itself."""
        from rgnir_tpu.kernels.select import masked_median_pallas_rows

        for r, block in ((40, 16), (9, 8)):
            vals = rng.uniform(-1.0, 1.0, (1, r, 1024)).astype(np.float32)
            # q24-grid values keep the quantized path exact
            vals = np.floor((vals + 1.0) * 128.0) / 128.0 - 1.0
            n_valid = r * 1024
            med = masked_median_pallas_rows(
                jnp.asarray(vals), n_valid, block_r=block
            )
            want = np.sort(vals.reshape(-1))[(n_valid - 1) // 2]
            assert float(np.asarray(med)[0]) == float(want)

    def test_select_onepass_pipeline_parity(self, rng):
        """analyze_image_kernel(select_onepass=True) — the opt-in
        one-pass select through the FULL pipeline — must match the
        default 3-pass path bitwise on every output."""
        from rgnir_tpu.kernels.pipeline import analyze_image_kernel

        img = jnp.asarray(
            rng.integers(0, 256, (2, 65, 197, 3), dtype=np.uint8)
        )
        kinds = ("NDVI", "GNDVI", "NDWI")
        a = analyze_image_kernel(img, kinds=kinds, select_onepass=True)
        b = analyze_image_kernel(img, kinds=kinds)
        np.testing.assert_array_equal(np.asarray(a.wb), np.asarray(b.wb))
        for k in kinds:
            for f in ("mean", "median", "min", "max", "std",
                      "coverage_pct"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(a.stats[k], f)),
                    np.asarray(getattr(b.stats[k], f)), err_msg=f"{k}.{f}",
                )

    def test_quantized_tail_means_variance(self):
        """masked_median_pallas(quantized=True, means=...) returns
        (median, centered sumsq) from the tail kernel's single pass:
        medians bit-equal to the means-less call, sumsq equal to the
        two-pass numpy variance within f32 accumulation tolerance, and
        take_prefix selecting only the canonical rows."""
        from rgnir_tpu.config import EPSILON
        from rgnir_tpu.kernels.select import masked_median_pallas

        rng = np.random.default_rng(13)
        n = 3000
        a = rng.integers(0, 256, (2, 3, n)).astype(np.float32)
        b = rng.integers(0, 256, (2, 3, n)).astype(np.float32)
        v = np.clip(
            (a - b) / (a + b + np.float32(EPSILON)), -1.0, 1.0
        ).astype(np.float32)
        means = v.mean(axis=-1, dtype=np.float64).astype(np.float32)
        med_plain = masked_median_pallas(
            jnp.asarray(v), n, take_prefix=(3, 2), quantized=True
        )
        med, ss = masked_median_pallas(
            jnp.asarray(v), n, take_prefix=(3, 2), quantized=True,
            means=jnp.asarray(means[:, :2]),
        )
        np.testing.assert_array_equal(np.asarray(med), np.asarray(med_plain))
        want = ((v[:, :2] - means[:, :2, None]) ** 2).sum(
            axis=-1, dtype=np.float64
        )
        np.testing.assert_allclose(
            np.asarray(ss), want, rtol=2e-6, atol=0
        )
        np.testing.assert_array_equal(
            np.asarray(med),
            np.median(v[:, :2], axis=-1).astype(np.float32),
        )
        with pytest.raises(ValueError, match="quantized"):
            masked_median_pallas(
                jnp.asarray(v), n, means=jnp.asarray(means)
            )

    def test_round0_hist_matches_select_round0(self, rng):
        """The fused kernel's with_round0 output must equal the select
        kernel's own round-0 byte histogram (shift 24, empty prefix) so
        skipping that round changes nothing."""
        from rgnir_tpu.kernels.select import (
            _pack_rows, _byte_hist, masked_median_pallas,
        )

        img_hwc = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
        pl_img = jnp.moveaxis(jnp.asarray(img_hwc), -1, -3)
        hist = planar_histograms(pl_img)
        n = 37 * 53
        lo, hi = wb_bounds_from_histogram(hist, n=n)
        kinds = ("NDVI", "NDWI")
        wb, idx, rgb, stats, r0 = fused_analyze_pallas(
            pl_img, lo, hi, kinds, block_r=4, with_round0=True
        )
        assert r0.shape == (2, 256)
        flat = idx.reshape(2, -1)
        rows = _pack_rows(flat, 4)
        ref_hist = _byte_hist(
            rows, jnp.zeros((2,), jnp.uint32), 24, n, 4, True
        )
        np.testing.assert_array_equal(np.asarray(r0), np.asarray(ref_hist))
        # and the median via the precomputed round 0 is bit-identical
        med_skip = masked_median_pallas(
            idx, n, reduce_ndim=2, round0_hist=r0
        )
        med_full = masked_median_pallas(idx, n, reduce_ndim=2)
        np.testing.assert_array_equal(
            np.asarray(med_skip), np.asarray(med_full)
        )

    def test_native_batched_matches_per_frame(self, rng):
        """The natively batched layout (frames stacked along the kernel
        row dimension with per-frame accumulator blocks —
        kernels/fused.py ``spf``) must be BIT-identical to per-frame
        calls across every output, including on a shape whose pixel
        count is not row-block aligned (per-frame tail padding)."""
        from rgnir_tpu.kernels.pipeline import analyze_image_kernel

        kinds = ("NDVI", "GNDVI", "NDWI")  # antipodal plan active
        imgs = rng.integers(0, 256, (3, 70, 100, 3), dtype=np.uint8)
        got = analyze_image_kernel(jnp.asarray(imgs), kinds=kinds)
        for b in range(imgs.shape[0]):
            ref = analyze_image_kernel(jnp.asarray(imgs[b]), kinds=kinds)
            np.testing.assert_array_equal(
                np.asarray(got.wb[b]), np.asarray(ref.wb)
            )
            for k in kinds:
                np.testing.assert_array_equal(
                    np.asarray(got.indices[k][b]),
                    np.asarray(ref.indices[k]),
                )
                np.testing.assert_array_equal(
                    np.asarray(got.renders[k][b]),
                    np.asarray(ref.renders[k]),
                )
                np.testing.assert_array_equal(
                    np.asarray(got.stats[k].histogram[b]),
                    np.asarray(ref.stats[k].histogram),
                )
                for f in ("mean", "median", "std", "min", "max",
                          "coverage_pct"):
                    np.testing.assert_array_equal(
                        np.asarray(getattr(got.stats[k], f)[b]),
                        np.asarray(getattr(ref.stats[k], f)),
                        err_msg=f"{k}.{f}[{b}]",
                    )

    def test_native_batched_hist_matches_vmap(self, rng):
        from rgnir_tpu.kernels.hist import (
            planar_histograms_pallas_batched,
        )

        imgs = rng.integers(0, 256, (4, 3, 33, 90), dtype=np.uint8)
        ref = planar_histograms_pallas(jnp.asarray(imgs))  # vmapped
        got = planar_histograms_pallas_batched(
            jnp.moveaxis(jnp.asarray(imgs), 1, 0)
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_with_hist_false_none_not_zeros(self, rng):
        """with_hist=False (the reference analyze_index stat set) must
        return histogram=None — explicit absence, never silent zeros —
        with every other stat identical to the with_hist=True run."""
        import jax

        from rgnir_tpu.kernels.pipeline import analyze_image_kernel

        img = jnp.asarray(
            rng.integers(0, 256, (2, 64, 96, 3), dtype=np.uint8)
        )
        full = analyze_image_kernel(img, kinds=("NDVI", "NDWI"))
        slim = analyze_image_kernel(
            img, kinds=("NDVI", "NDWI"), with_hist=False
        )
        for kind in ("NDVI", "NDWI"):
            assert slim.stats[kind].histogram is None
            assert full.stats[kind].histogram is not None
            for f in ("mean", "median", "std", "min", "max",
                      "coverage_pct"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(slim.stats[kind], f)),
                    np.asarray(getattr(full.stats[kind], f)), err_msg=f,
                )
        # jnp path mirrors the contract
        from rgnir_tpu.pipeline.fused import analyze_image_jit

        jslim = analyze_image_jit(img, kinds=("NDVI",), with_hist=False)
        assert jslim.stats["NDVI"].histogram is None

    def test_unaligned_and_stats_masking(self, rng):
        img_hwc = rng.integers(0, 256, (41, 77, 3), dtype=np.uint8)
        pl_img = jnp.moveaxis(jnp.asarray(img_hwc), -1, -3)
        hist = planar_histograms(pl_img)
        lo, hi = wb_bounds_from_histogram(hist, n=41 * 77)
        wb, idx, rgb, stats = fused_analyze_pallas(
            pl_img, lo, hi, ("NDVI",), block_r=4
        )
        ref_wb = golden.golden_white_balance(img_hwc)
        got_wb = np.moveaxis(np.asarray(wb), 0, -1)
        assert np.abs(got_wb.astype(int) - ref_wb.astype(int)).max() <= 1
        s = np.asarray(stats[0])
        assert s[S_HIST:S_HIST + 50].sum() == 41 * 77  # padding masked


class TestInt32PositionGuard:
    """Oversize single images must fail loudly, not wrap int32 masks
    (kernels flatten positions as iota + step*n in int32)."""

    def test_fused_rejects_beyond_2gpix(self):
        from rgnir_tpu.kernels.fused import fused_analyze_pallas

        side = 46_342  # side^2 > 2^31 - 1
        img = jax.ShapeDtypeStruct((3, side, side), jnp.uint8)
        lo = jax.ShapeDtypeStruct((3,), jnp.float32)
        hi = jax.ShapeDtypeStruct((3,), jnp.float32)
        with pytest.raises(ValueError, match="analyze_mosaic"):
            jax.eval_shape(
                lambda im, a, b: fused_analyze_pallas(im, a, b, ("NDVI",)),
                img, lo, hi,
            )

    def test_hist_rejects_beyond_2gpix(self):
        from rgnir_tpu.kernels.hist import planar_histograms_pallas

        side = 46_342
        img = jax.ShapeDtypeStruct((3, side, side), jnp.uint8)
        with pytest.raises(ValueError, match="analyze_mosaic"):
            jax.eval_shape(planar_histograms_pallas, img)

    def test_select_rejects_beyond_2gpix(self):
        from rgnir_tpu.kernels.select import radix_order_statistic_pallas

        vals = jax.ShapeDtypeStruct((46_342 * 46_342,), jnp.float32)
        rank = jax.ShapeDtypeStruct((), jnp.int32)
        with pytest.raises(ValueError, match="analyze_mosaic"):
            jax.eval_shape(radix_order_statistic_pallas, vals, rank)

    def test_just_below_bound_accepted(self):
        """A shape under the limit traces fine (shape-only check)."""
        from rgnir_tpu.kernels.hist import flatten_to_rows

        n_rows = 2_097_144  # multiple of 8; padded total < 2^31-1
        x = jax.ShapeDtypeStruct((3, n_rows, 1024), jnp.uint8)
        out = jax.eval_shape(lambda a: flatten_to_rows(a, 8), x)
        assert out.shape[-1] == 1024

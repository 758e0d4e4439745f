"""Distributed tests on the 8-device virtual CPU mesh (SURVEY.md section 4):
sharded mosaic stats must equal single-device stats must equal NumPy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgnir_tpu.parallel import (
    analyze_mosaic,
    local_mesh,
    masked_median,
    ordered_u32_from_f32,
    f32_from_ordered_u32,
    radix_order_statistic,
)
from rgnir_tpu.ops.stats import index_stats, to_analyze_index_dict
from rgnir_tpu.ops.wb import white_balance
from rgnir_tpu.ops.indices import compute_index

import golden


class TestOrderedKey:
    def test_roundtrip_and_monotone(self, rng):
        x = np.concatenate(
            [rng.normal(size=1000), [-np.inf, np.inf, 0.0, -0.0, 1e-38, -1e-38]]
        ).astype(np.float32)
        keys = np.asarray(ordered_u32_from_f32(jnp.asarray(x)))
        back = np.asarray(f32_from_ordered_u32(jnp.asarray(keys)))
        np.testing.assert_array_equal(back, x)
        # Strictly monotone on *distinct* values. (-0.0 keys below +0.0,
        # which float comparison calls equal — fine for order statistics.)
        order = np.argsort(x, kind="stable")
        xs, ks = x[order], keys[order]
        distinct = xs[1:] > xs[:-1]
        assert (ks[1:][distinct] > ks[:-1][distinct]).all()
        neg0 = np.asarray(ordered_u32_from_f32(jnp.float32(-0.0)))
        pos0 = np.asarray(ordered_u32_from_f32(jnp.float32(0.0)))
        assert neg0 < pos0


class TestRadixSelect:
    def test_order_statistic_exact(self, rng):
        x = rng.normal(size=4097).astype(np.float32)
        xs = np.sort(x)
        for rank in [0, 1, 2048, 4095, 4096]:
            got = float(radix_order_statistic(jnp.asarray(x), rank))
            assert got == xs[rank], rank

    def test_masked(self, rng):
        x = rng.normal(size=1000).astype(np.float32)
        mask = rng.random(1000) < 0.5
        valid = np.sort(x[mask])
        got = float(
            radix_order_statistic(jnp.asarray(x), 10, mask=jnp.asarray(mask))
        )
        assert got == valid[10]

    def test_exact_quantiles_general_floats(self, rng):
        from rgnir_tpu.ops.select import exact_quantiles

        x = rng.normal(size=2001).astype(np.float32)
        qs = (0.0, 2.0, 33.3, 50.0, 98.0, 100.0)
        got = np.asarray(exact_quantiles(jnp.asarray(x), qs, n_valid=2001))
        want = np.percentile(x, list(qs))  # array-q f64 model
        np.testing.assert_allclose(got, want, rtol=3e-7, atol=1e-7)

    def test_exact_quantiles_batched_and_masked(self, rng):
        from rgnir_tpu.ops.select import exact_quantiles

        x = rng.normal(size=(3, 500)).astype(np.float32)
        mask = rng.random((3, 500)) < 0.6
        # equal per-row valid counts (static n contract)
        n = int(mask[0].sum())
        for b in range(3):
            idxs = np.nonzero(mask[b])[0]
            mask[b] = False
            mask[b][idxs[:n]] = True
        got = np.asarray(
            exact_quantiles(
                jnp.asarray(x), (25.0, 75.0), n_valid=n,
                mask=jnp.asarray(mask),
            )
        )
        for b in range(3):
            want = np.percentile(x[b][mask[b]], [25.0, 75.0])
            np.testing.assert_allclose(got[b], want, rtol=3e-7, atol=1e-7)

    def test_exact_quantiles_nine_deciles(self, rng):
        """All nine deciles in the fixed 3-pass scheme == numpy exactly
        (integer-valued data makes f64/f32 lerps bit-identical)."""
        from rgnir_tpu.ops.select import exact_quantiles

        x = rng.integers(-500, 500, size=12_345).astype(np.float32)
        qs = tuple(float(q) for q in range(10, 100, 10))
        got = np.asarray(exact_quantiles(jnp.asarray(x), qs, n_valid=x.size))
        want = np.percentile(x, list(qs))
        np.testing.assert_allclose(got, want, rtol=3e-7, atol=1e-7)

    def test_exact_quantiles_dense_percentile_grid(self, rng):
        """A dense 101-point percentile grid (the O(Q*N)-mask risk the
        round-2 verdict flagged): memory is bounded by the chunked
        pass-2/3 scans and every value matches numpy."""
        from rgnir_tpu.ops.select import exact_quantiles

        x = rng.normal(size=20_000).astype(np.float32)
        qs = tuple(float(q) for q in range(0, 101))
        got = np.asarray(exact_quantiles(jnp.asarray(x), qs, n_valid=x.size))
        want = np.percentile(x, list(qs))
        np.testing.assert_allclose(got, want, rtol=3e-7, atol=1e-7)

    def test_exact_quantiles_distributed(self, rng):
        """Sharded deciles (psum'd histograms + pmin) == single-device."""
        from functools import partial

        from jax.sharding import PartitionSpec as P

        from rgnir_tpu.ops.select import exact_quantiles
        from rgnir_tpu.parallel.mesh import make_mesh

        x = rng.normal(size=4096).astype(np.float32)
        qs = (10.0, 50.0, 90.0)
        mesh = make_mesh((8,), ("d",))

        @partial(
            jax.shard_map, mesh=mesh, in_specs=P("d"), out_specs=P(),
            check_vma=False,
        )
        def sharded(v):
            return exact_quantiles(v, qs, n_valid=4096, axis_name="d")

        got = np.asarray(sharded(jnp.asarray(x)))
        want = np.percentile(x, list(qs))
        np.testing.assert_allclose(got, want, rtol=3e-7, atol=1e-7)

    @pytest.mark.parametrize("n", [999, 1000])
    def test_median_numpy_parity(self, rng, n):
        x = rng.normal(size=n).astype(np.float32)
        got = float(masked_median(jnp.asarray(x), n))
        assert got == float(np.median(x))

    def test_median_heavy_ties(self, rng):
        """Adjacent-rank fast path: both branches (tie vs distinct)."""
        from rgnir_tpu.ops.select import adjacent_order_statistics

        # ties straddling the middle
        x = np.array([3.0, 1.0, 1.0, 1.0, 2.0, 2.0], np.float32)
        lo, hi = adjacent_order_statistics(jnp.asarray(x), 2)
        assert (float(lo), float(hi)) == (1.0, 2.0)  # distinct branch
        lo, hi = adjacent_order_statistics(jnp.asarray(x), 1)
        assert (float(lo), float(hi)) == (1.0, 1.0)  # tie branch
        for trial in range(3):
            y = rng.choice([0.0, 0.25, -0.5, 1.0], size=1000).astype(np.float32)
            got = float(masked_median(jnp.asarray(y), 1000))
            assert got == float(np.median(y)), trial

    def test_batched_even_median(self, rng):
        x = rng.normal(size=(3, 10, 10)).astype(np.float32)
        got = np.asarray(masked_median(x, 100, reduce_ndim=2))
        want = np.array([np.median(x[b]) for b in range(3)], np.float32)
        np.testing.assert_array_equal(got, want)


@pytest.fixture
def mosaic(rng):
    """A 200x176 'mosaic' (odd vs the 8-device row split: exercises padding)."""
    return rng.integers(0, 256, (200, 176, 3), dtype=np.uint8)


class TestAnalyzeMosaic:
    def test_matches_single_device(self, mosaic):
        mesh = local_mesh("d")
        assert mesh.devices.size == 8
        res = analyze_mosaic(mosaic, kinds=("NDVI", "NDWI"), mesh=mesh)

        wb_single = np.asarray(white_balance(jnp.asarray(mosaic)))
        h = mosaic.shape[0]
        np.testing.assert_array_equal(np.asarray(res.wb)[:h], wb_single)

        for kind in ("NDVI", "NDWI"):
            idx_single = np.asarray(compute_index(jnp.asarray(wb_single), kind))
            np.testing.assert_array_equal(
                np.asarray(res.indices[kind])[:h], idx_single
            )
            st_single = index_stats(jnp.asarray(idx_single), kind)
            st = res.stats[kind]
            assert float(st.mean) == pytest.approx(float(st_single.mean), abs=1e-6)
            assert float(st.median) == float(st_single.median)
            assert float(st.std) == pytest.approx(float(st_single.std), abs=1e-6)
            assert float(st.min) == float(st_single.min)
            assert float(st.max) == float(st_single.max)
            assert float(st.coverage_pct) == pytest.approx(
                float(st_single.coverage_pct), abs=1e-6
            )
            np.testing.assert_array_equal(
                np.asarray(st.histogram), np.asarray(st_single.histogram)
            )

    def test_numpy_end_to_end(self, mosaic):
        """Sharded mosaic vs the NumPy reference semantics end to end."""
        res = analyze_mosaic(mosaic, kinds=("NDVI",), mesh=local_mesh("d"))
        ref_wb = golden.golden_white_balance(mosaic)
        h = mosaic.shape[0]
        wb = np.asarray(res.wb)[:h]
        diff = np.abs(wb.astype(int) - ref_wb.astype(int))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3
        ref_idx = golden.golden_index(wb, "NDVI")
        want = golden.golden_analyze_index(ref_idx, "NDVI")
        got = to_analyze_index_dict(res.stats["NDVI"], "NDVI")
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-4), k

    def test_renders(self, mosaic):
        res = analyze_mosaic(
            mosaic, kinds=("NDVI",), mesh=local_mesh("d"), with_renders=True
        )
        assert res.renders["NDVI"].shape[-1] == 3

    def test_kernel_impl_matches_jnp(self, mosaic):
        """The Pallas-kernel shard body (the multi-chip TPU production
        path) must agree with the jnp shard body bit-for-bit."""
        mesh = local_mesh("d")
        a = analyze_mosaic(
            mosaic, kinds=("NDVI",), mesh=mesh, impl="kernel",
            with_renders=True,
        )
        b = analyze_mosaic(
            mosaic, kinds=("NDVI",), mesh=mesh, impl="jnp",
            with_renders=True,
        )
        h = mosaic.shape[0]
        np.testing.assert_array_equal(np.asarray(a.wb)[:h], np.asarray(b.wb)[:h])
        np.testing.assert_array_equal(
            np.asarray(a.indices["NDVI"])[:h], np.asarray(b.indices["NDVI"])[:h]
        )
        np.testing.assert_array_equal(
            np.asarray(a.renders["NDVI"])[:h], np.asarray(b.renders["NDVI"])[:h]
        )
        sa, sb = a.stats["NDVI"], b.stats["NDVI"]
        assert float(sa.median) == float(sb.median)
        assert float(sa.min) == float(sb.min)
        assert float(sa.max) == float(sb.max)
        assert float(sa.coverage_pct) == pytest.approx(
            float(sb.coverage_pct), abs=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(sa.histogram), np.asarray(sb.histogram)
        )


class TestMeshSizes:
    @pytest.mark.parametrize("n_dev", [1, 2, 4])
    def test_submesh_stats_invariant(self, mosaic, n_dev):
        """Global stats must not depend on the mesh size."""
        ref = analyze_mosaic(mosaic, kinds=("NDVI",), mesh=local_mesh("d", 8))
        got = analyze_mosaic(
            mosaic, kinds=("NDVI",), mesh=local_mesh("d", n_dev)
        )
        for f in ("mean", "median", "std", "min", "max", "coverage_pct"):
            a = float(getattr(got.stats["NDVI"], f))
            b = float(getattr(ref.stats["NDVI"], f))
            assert a == pytest.approx(b, abs=1e-6), (n_dev, f)
        np.testing.assert_array_equal(
            np.asarray(got.stats["NDVI"].histogram),
            np.asarray(ref.stats["NDVI"].histogram),
        )

    def test_2d_mesh_matches_single_device(self, mosaic):
        """Row x column sharding (2-D mesh) must agree with 1-device."""
        mesh2d = jax.make_mesh((4, 2), ("dr", "dc"))
        got = analyze_mosaic(mosaic, kinds=("NDVI",), mesh=mesh2d)
        ref = analyze_mosaic(
            mosaic, kinds=("NDVI",), mesh=local_mesh("d", 1)
        )
        h, w = mosaic.shape[:2]
        np.testing.assert_array_equal(
            np.asarray(got.wb)[:h, :w], np.asarray(ref.wb)[:h]
        )
        np.testing.assert_array_equal(
            np.asarray(got.indices["NDVI"])[:h, :w],
            np.asarray(ref.indices["NDVI"])[:h],
        )
        for f in ("mean", "median", "std", "min", "max", "coverage_pct"):
            assert float(getattr(got.stats["NDVI"], f)) == pytest.approx(
                float(getattr(ref.stats["NDVI"], f)), abs=1e-6
            ), f
        np.testing.assert_array_equal(
            np.asarray(got.stats["NDVI"].histogram),
            np.asarray(ref.stats["NDVI"].histogram),
        )

    def test_2d_mesh_kernel_impl(self, mosaic):
        """Pallas shard body on a 2-D mesh (analytic padding correction)
        must agree with the jnp 2-D body."""
        mesh2d = jax.make_mesh((4, 2), ("dr", "dc"))
        got = analyze_mosaic(
            mosaic, kinds=("NDVI", "NDWI"), mesh=mesh2d, impl="kernel",
            with_renders=True,
        )
        ref = analyze_mosaic(
            mosaic, kinds=("NDVI", "NDWI"), mesh=mesh2d, with_renders=True
        )
        h, w = mosaic.shape[:2]
        np.testing.assert_array_equal(
            np.asarray(got.wb)[:h, :w], np.asarray(ref.wb)[:h, :w]
        )
        for kind in ("NDVI", "NDWI"):
            np.testing.assert_array_equal(
                np.asarray(got.indices[kind])[:h, :w],
                np.asarray(ref.indices[kind])[:h, :w],
            )
            np.testing.assert_array_equal(
                np.asarray(got.renders[kind])[:h, :w],
                np.asarray(ref.renders[kind])[:h, :w],
            )
            sa, sb = got.stats[kind], ref.stats[kind]
            assert float(sa.median) == float(sb.median), kind
            assert float(sa.min) == float(sb.min), kind
            assert float(sa.max) == float(sb.max), kind
            assert float(sa.coverage_pct) == pytest.approx(
                float(sb.coverage_pct), abs=1e-6
            ), kind
            assert float(sa.mean) == pytest.approx(
                float(sb.mean), abs=1e-6
            ), kind
            np.testing.assert_array_equal(
                np.asarray(sa.histogram), np.asarray(sb.histogram),
                err_msg=kind,
            )

    def test_kernel_impl_three_kinds(self, mosaic):
        res = analyze_mosaic(
            mosaic, kinds=("NDVI", "GNDVI", "NDWI"),
            mesh=local_mesh("d"), impl="kernel",
        )
        ref = analyze_mosaic(
            mosaic, kinds=("NDVI", "GNDVI", "NDWI"), mesh=local_mesh("d")
        )
        for k in ("NDVI", "GNDVI", "NDWI"):
            assert float(res.stats[k].median) == float(ref.stats[k].median), k
            np.testing.assert_array_equal(
                np.asarray(res.stats[k].histogram),
                np.asarray(ref.stats[k].histogram),
            )


class TestHaloExchange:
    def test_halos_match_global_slices(self, rng):
        from jax.sharding import PartitionSpec as P
        from rgnir_tpu.parallel.halo import exchange_row_halos

        mesh = local_mesh("d")
        n_dev = 8
        x = rng.normal(size=(64, 32)).astype(np.float32)  # 8 rows/shard
        halo = 3

        def fn(shard):
            return exchange_row_halos(shard, halo, "d")

        out = jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=P("d"), out_specs=P("d"),
            check_vma=False,
        ))(jnp.asarray(x))
        out = np.asarray(out)  # (8 * (8 + 2*halo), 32)
        block = 64 // n_dev
        ext = block + 2 * halo
        for d in range(n_dev):
            got = out[d * ext:(d + 1) * ext]
            lo = d * block - halo
            hi = (d + 1) * block + halo
            want = x[np.clip(np.arange(lo, hi), 0, 63)]
            np.testing.assert_array_equal(got, want, err_msg=f"shard {d}")


class TestTiling:
    def test_roundtrip(self, rng):
        from rgnir_tpu.tiling import pad_to_multiple, tile_image, untile_image

        img = rng.integers(0, 256, (70, 50, 3), dtype=np.uint8)
        padded, (h, w) = pad_to_multiple(jnp.asarray(img), 32, 32)
        assert padded.shape == (96, 64, 3)
        tiles = tile_image(padded, 32, 32)
        assert tiles.shape == (3, 2, 32, 32, 3)
        back = np.asarray(untile_image(tiles))[:h, :w]
        np.testing.assert_array_equal(back, img)

    def test_valid_mask(self):
        from rgnir_tpu.tiling import valid_mask

        m = np.asarray(valid_mask((8, 8), (5, 6)))
        assert m.sum() == 30
        assert m[:5, :6].all() and not m[5:].any() and not m[:, 6:].any()


class TestShardedChangeDetection:
    """Full-res sharded change detection (halo-exchange warp) — the
    capability the reference caps at 1024 px (process-images.py:530-536)."""

    def _pair(self, rng, h, w, roll):
        # Smooth-ish content so phase correlation locks on cleanly.
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = (
            120
            + 60 * np.sin(xx / 7.0)
            + 50 * np.cos(yy / 11.0)
            + rng.normal(0, 6, (h, w))
        )
        img = np.stack([base, base * 0.8 + 20, base * 1.1], axis=-1)
        early = np.clip(img, 0, 255).astype(np.uint8)
        late = np.roll(early, roll, axis=(0, 1))
        return early, late

    def test_sharded_matches_single_device(self, rng):
        from rgnir_tpu.parallel.change import change_detection_mosaic
        from rgnir_tpu.parallel.mesh import make_mesh

        h, w = 137, 96
        early, late = self._pair(rng, h, w, roll=(4, -3))
        hp = -(-h // 8) * 8
        kwargs = dict(halo=16, proxy_stride=1, pad_to=hp)
        r8 = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDVI",
            mesh=make_mesh((8,), ("d",)), **kwargs,
        )
        r1 = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDVI",
            mesh=make_mesh((1,), ("d",)), **kwargs,
        )
        np.testing.assert_array_equal(
            np.asarray(r8.shift), np.asarray(r1.shift)
        )
        for fld in ("early_index", "late_index", "diff"):
            np.testing.assert_array_equal(
                np.asarray(getattr(r8, fld))[:h],
                np.asarray(getattr(r1, fld))[:h],
            )
        assert float(r8.stats.median) == float(r1.stats.median)
        np.testing.assert_allclose(
            float(r8.stats.mean), float(r1.stats.mean), atol=1e-6
        )
        np.testing.assert_allclose(
            float(r8.stats.std), float(r1.stats.std), atol=1e-6
        )
        assert float(r8.stats.min) == float(r1.stats.min)
        assert float(r8.stats.max) == float(r1.stats.max)

    def test_shift_recovered_and_diff_small(self, rng):
        from rgnir_tpu.parallel.change import change_detection_mosaic
        from rgnir_tpu.parallel.mesh import make_mesh

        h, w = 160, 120
        roll = (6, -5)
        early, late = self._pair(rng, h, w, roll=roll)
        res = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDVI",
            mesh=make_mesh((8,), ("d",)), halo=16, proxy_stride=1,
        )
        # Aligning the rolled image back: shift == -roll.
        shift = np.asarray(res.shift)
        assert shift[0] == -roll[0] and shift[1] == -roll[1]
        # Away from the wrap seam the aligned diff vanishes.
        diff = np.asarray(res.diff)[:h]
        interior = diff[12:-12, 12:-12]
        assert np.abs(interior).max() < 1e-6
        assert abs(float(res.stats.median)) < 1e-6

    def test_shift_beyond_halo_grows_and_recovers(self, rng):
        """A true shift beyond halo-1 must never produce a silent wrong
        diff (round-2 verdict #4): by default the halo grows and the
        shift is still recovered exactly."""
        from rgnir_tpu.parallel.change import change_detection_mosaic
        from rgnir_tpu.parallel.mesh import make_mesh

        h, w = 160, 120
        roll = (12, -5)  # |dy|=12 > halo-1=3
        early, late = self._pair(rng, h, w, roll=roll)
        res = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDVI",
            mesh=make_mesh((8,), ("d",)), halo=4, proxy_stride=1,
        )
        shift = np.asarray(res.shift)
        assert shift[0] == -roll[0] and shift[1] == -roll[1]
        assert not bool(res.shift_saturated)
        assert np.abs(np.asarray(res.diff)[16:h - 16, 16:-16]).max() < 1e-6

    def test_shift_beyond_halo_saturates_loudly(self, rng):
        """With grow_halo=False the clamp is applied but announced:
        shift_saturated=True and shift_raw carries the estimate."""
        from rgnir_tpu.parallel.change import change_detection_mosaic
        from rgnir_tpu.parallel.mesh import make_mesh

        h, w = 160, 120
        roll = (12, -5)
        early, late = self._pair(rng, h, w, roll=roll)
        res = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDVI",
            mesh=make_mesh((8,), ("d",)), halo=4, proxy_stride=1,
            grow_halo=False,
        )
        assert bool(res.shift_saturated)
        assert np.asarray(res.shift)[0] == -3.0  # clamped to halo-1
        raw = np.asarray(res.shift_raw)
        assert raw[0] == -roll[0] and raw[1] == -roll[1]

    def test_unsaturated_flags_false(self, rng):
        from rgnir_tpu.parallel.change import change_detection_mosaic
        from rgnir_tpu.parallel.mesh import make_mesh

        early, late = self._pair(rng, 160, 120, roll=(2, -1))
        res = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDVI",
            mesh=make_mesh((8,), ("d",)), halo=8, proxy_stride=1,
        )
        assert not bool(res.shift_saturated)
        np.testing.assert_array_equal(
            np.asarray(res.shift), np.asarray(res.shift_raw)
        )

    def test_field_warp_matches_local_warp(self, rng):
        """field_warp_haloed on an unsharded block (halo 0, window =
        whole image) must be bit-identical to
        register.local.warp_with_field — same interpolation, same
        stencil, same lerp order."""
        from rgnir_tpu.parallel.change import field_warp_haloed
        from rgnir_tpu.register.local import warp_with_field

        h, w, tile = 96, 80, (32, 16)
        img = jnp.asarray(
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        )
        field = jnp.asarray(
            rng.uniform(-5, 5, (3, 5, 2)).astype(np.float32)
        )
        a = warp_with_field(img, field, tile)
        # jit like warp_with_field is — eager op-by-op execution loses
        # the fused-multiply-add contractions and drifts ~1e-3.
        b = jax.jit(
            lambda i, f: field_warp_haloed(
                i, f, jnp.int32(0), jnp.int32(0), h, w, 0, 0, tile
            )
        )(img, field)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def _nonrigid_pair(self, rng, h, w, tile, g=(-4.0, 3.0), amp=4.0):
        """(early, late, f_true): late = early warped by a smooth
        per-tile field f_true (global g + row-varying residual); the
        detector should recover field ≈ -f_true. Rich low-noise
        texture: phase correlation needs structure, while resample
        noise would otherwise dominate the diff-improvement signal."""
        from rgnir_tpu.register.local import warp_with_field

        # Aperiodic low-pass random textures, INDEPENDENT per band:
        # periodic sinusoids alias the tile correlations, a strong
        # noise floor would drown the diff-improvement signal, and
        # channels sharing one base make the index map near-constant
        # (alignment then barely moves the diff).
        fy = np.fft.fftfreq(h)[:, None]
        fx = np.fft.rfftfreq(w)[None, :]
        # Two spectral scales so EVERY 32-ish-px tile holds structure:
        # coarse blobs alone leave some tiles featureless and their
        # correlations mis-lock.
        f2 = fy**2 + fx**2
        lp = (
            np.exp(-f2 / (2 * 0.03**2))
            + 0.5 * np.exp(-f2 / (2 * 0.09**2))
        )

        def blob():
            sm = np.fft.irfft2(
                np.fft.rfft2(rng.normal(0, 1, (h, w))) * lp, s=(h, w)
            )
            sm = (sm - sm.min()) / (sm.max() - sm.min())
            return 30 + 200 * sm + rng.normal(0, 2, (h, w))

        img = np.stack([blob(), blob(), blob()], axis=-1)
        early = np.clip(img, 0, 255).astype(np.uint8)
        ty, tx = h // tile[0], -(-w // tile[1])
        ry = amp * np.sin(
            2 * np.pi * np.arange(ty, dtype=np.float32) / ty
        )
        f_true = np.zeros((ty, tx, 2), np.float32)
        f_true[..., 0] = g[0] + ry[:, None]
        f_true[..., 1] = g[1]
        late = np.clip(
            np.round(np.asarray(warp_with_field(
                jnp.asarray(early), jnp.asarray(f_true), tile
            ))), 0, 255,
        ).astype(np.uint8)
        return early, late, f_true

    def test_local_field_recovers_nonrigid_warp(self, rng):
        """local_tile: the recovered per-tile field approximates the
        negated synthesis field, and the non-rigid diff is tighter
        than the rigid-only one (the capability the reference lacks
        entirely: one translation at <= 1024 px)."""
        from rgnir_tpu.parallel.change import change_detection_mosaic
        from rgnir_tpu.parallel.mesh import make_mesh

        h, w, tile = 256, 128, (32, 64)
        early, late, f_true = self._nonrigid_pair(rng, h, w, tile)
        mesh = make_mesh((8,), ("d",))
        kw = dict(halo=16, proxy_stride=1, upsample_factor=2)
        rloc = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDVI", mesh=mesh,
            local_tile=tile, **kw,
        )
        rrig = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDVI", mesh=mesh,
            **kw,
        )
        assert rloc.field.shape == f_true.shape
        assert not bool(rloc.field_saturated)
        # Interior tiles (edge tiles see reflected content): estimated
        # total shift ~ -f_true within the upsample resolution.
        got = np.asarray(rloc.field)[1:-1]
        want = -f_true[1:-1]
        assert np.abs(got - want).max() < 0.9, (got - want)
        # The rigid global shift cannot express the row-varying part:
        # the non-rigid diff must be materially tighter.
        assert float(rloc.stats.std) < 0.75 * float(rrig.stats.std)

    def test_local_field_fractional_global_shift(self, rng):
        """Regression (code review, 2026-08-18): the field must compose
        residuals with the INTEGER pre-shift they were measured
        against. Composing with the fractional global estimate
        double-counts its subpixel remainder — a true 4.5-row shift
        came back as a 5.0-row field, worse than the rigid warp."""
        from rgnir_tpu.parallel.change import change_detection_mosaic
        from rgnir_tpu.parallel.mesh import make_mesh

        h, w, tile = 256, 128, (32, 64)
        early, late, f_true = self._nonrigid_pair(
            rng, h, w, tile, g=(-4.5, 2.5), amp=0.0
        )
        res = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDVI",
            mesh=make_mesh((8,), ("d",)), halo=16, proxy_stride=1,
            upsample_factor=4, local_tile=tile,
        )
        got = np.asarray(res.field)[1:-1]
        # True constant field (4.5, -2.5). The double-count bug shifted
        # every fractional component by the global subpixel remainder
        # (~0.5 px); the estimator itself is good to ~0.375 px on this
        # u8-rounded bilinear synthesis (register.local shows the same
        # spread), so assert inside 0.45.
        assert np.abs(got - np.float32([4.5, -2.5])).max() < 0.45, got

    def test_local_field_matches_single_device(self, rng):
        """local_tile outputs are bit-identical across mesh sizes (the
        tile grid never straddles shards; the field is all_gathered)."""
        from rgnir_tpu.parallel.change import change_detection_mosaic
        from rgnir_tpu.parallel.mesh import make_mesh

        h, w, tile = 256, 96, (32, 48)
        early, late, _ = self._nonrigid_pair(rng, h, w, tile, amp=1.5)
        kw = dict(halo=16, proxy_stride=1, pad_to=h, local_tile=tile)
        r8 = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDVI",
            mesh=make_mesh((8,), ("d",)), **kw,
        )
        r1 = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDVI",
            mesh=make_mesh((1,), ("d",)), **kw,
        )
        np.testing.assert_array_equal(
            np.asarray(r8.field), np.asarray(r1.field)
        )
        for fld in ("early_index", "late_index", "diff"):
            np.testing.assert_array_equal(
                np.asarray(getattr(r8, fld))[:h],
                np.asarray(getattr(r1, fld))[:h],
            )
        assert float(r8.stats.median) == float(r1.stats.median)

    def test_local_field_saturation_loud_and_grows(self, rng):
        """A tile whose total shift exceeds halo-1 must never warp
        silently wrong: grow_halo=False reports field_saturated; the
        default retries once with a halo sized to |global| + the
        residual bound."""
        from rgnir_tpu.parallel.change import change_detection_mosaic
        from rgnir_tpu.parallel.mesh import make_mesh

        h, w, tile = 256, 128, (32, 64)
        early, late, _ = self._nonrigid_pair(
            rng, h, w, tile, g=(-6.0, 0.0), amp=2.0
        )
        mesh = make_mesh((8,), ("d",))
        kw = dict(proxy_stride=1, upsample_factor=2, local_tile=tile)
        rsat = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDVI", mesh=mesh,
            halo=8, grow_halo=False, **kw,
        )
        assert bool(rsat.field_saturated)
        rgrow = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDVI", mesh=mesh,
            halo=8, **kw,
        )
        assert not bool(rgrow.field_saturated)
        assert float(rgrow.stats.std) < float(rsat.stats.std)

    def test_strided_proxy_parity(self, rng):
        """stride-2 proxy: sharded == single-device, same auto stride."""
        from rgnir_tpu.parallel.change import (
            _pick_proxy_stride, change_detection_mosaic,
        )
        from rgnir_tpu.parallel.mesh import make_mesh

        h, w = 1152, 96
        assert _pick_proxy_stride(h, 1152 // 8) == 2
        early, late = self._pair(rng, h, w, roll=(9, 4))
        kwargs = dict(halo=24, proxy_stride=2, pad_to=h)
        r8 = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDWI",
            mesh=make_mesh((8,), ("d",)), **kwargs,
        )
        r1 = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDWI",
            mesh=make_mesh((1,), ("d",)), **kwargs,
        )
        np.testing.assert_array_equal(
            np.asarray(r8.shift), np.asarray(r1.shift)
        )
        np.testing.assert_array_equal(
            np.asarray(r8.diff), np.asarray(r1.diff)
        )

    def test_haloed_warp_matches_unsharded(self, rng):
        """bilinear_shift_rows_haloed on a middle block == the matching
        rows of bilinear_shift_2d on the full image."""
        from rgnir_tpu.parallel.change import bilinear_shift_rows_haloed
        from rgnir_tpu.register.warp import bilinear_shift_2d

        h, w, halo, bh, row0 = 64, 40, 8, 16, 24
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        full = np.asarray(
            bilinear_shift_2d(jnp.asarray(img), jnp.float32(3.3),
                              jnp.float32(-2.7))
        )
        ext = jnp.asarray(img[row0 - halo: row0 + bh + halo])
        got = np.asarray(
            bilinear_shift_rows_haloed(
                ext, jnp.float32(3.3), jnp.float32(-2.7),
                jnp.int32(row0), h, halo,
            )
        )
        np.testing.assert_array_equal(got, full[row0: row0 + bh])


class TestShardedChangeDetection2D:
    """Row x column sharded change detection (2-D mesh) — the layout for
    wide survey strips where 1-D row shards get thinner than the
    alignment stencil."""

    _pair = TestShardedChangeDetection._pair

    def test_col_halos_match_global_slices(self, rng):
        from jax.sharding import PartitionSpec as P
        from rgnir_tpu.parallel.halo import exchange_halos
        from rgnir_tpu.parallel.mesh import make_mesh

        mesh = make_mesh((2, 4), ("dr", "dc"))
        x = rng.normal(size=(16, 32)).astype(np.float32)  # 8 cols/shard
        halo = 3

        def fn(shard):
            return exchange_halos(shard, halo, "dc", dim=1)

        out = np.asarray(jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=P("dr", "dc"),
            out_specs=P("dr", "dc"), check_vma=False,
        ))(jnp.asarray(x)))  # (16, 4 * (8 + 2*halo))
        block, ext = 8, 8 + 2 * halo
        for r in range(2):
            rows = slice(r * 8, (r + 1) * 8)
            for c in range(4):
                got = out[rows, c * ext:(c + 1) * ext]
                idx = np.clip(np.arange(c * block - halo,
                                        (c + 1) * block + halo), 0, 31)
                np.testing.assert_array_equal(
                    got, x[rows][:, idx], err_msg=f"shard ({r},{c})"
                )

    def test_haloed_2d_warp_matches_unsharded(self, rng):
        """bilinear_shift_2d_haloed on an interior block (row AND column
        halos) == the matching window of bilinear_shift_2d."""
        from rgnir_tpu.parallel.change import bilinear_shift_2d_haloed
        from rgnir_tpu.register.warp import bilinear_shift_2d

        h, w, halo, bh, bw, row0, col0 = 64, 48, 8, 16, 16, 24, 16
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        full = np.asarray(
            bilinear_shift_2d(jnp.asarray(img), jnp.float32(3.3),
                              jnp.float32(-2.7))
        )
        ext = jnp.asarray(
            img[row0 - halo: row0 + bh + halo,
                col0 - halo: col0 + bw + halo]
        )
        got = np.asarray(
            bilinear_shift_2d_haloed(
                ext, jnp.float32(3.3), jnp.float32(-2.7),
                jnp.int32(row0), jnp.int32(col0), h, w, halo, halo,
            )
        )
        np.testing.assert_array_equal(
            got, full[row0: row0 + bh, col0: col0 + bw]
        )

    def test_2d_matches_1d_mesh(self, rng):
        from rgnir_tpu.parallel.change import change_detection_mosaic
        from rgnir_tpu.parallel.mesh import make_mesh

        h, w = 137, 96  # w divisible by 2: no column padding drift
        early, late = self._pair(rng, h, w, roll=(4, -3))
        hp = 144  # multiple of 8 (1-D) and of 4 (2-D rows)
        r2d = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDVI",
            mesh=make_mesh((4, 2), ("dr", "dc")),
            halo=16, proxy_stride=1, pad_to=(hp, w),
        )
        r1d = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDVI",
            mesh=make_mesh((8,), ("d",)),
            halo=16, proxy_stride=1, pad_to=hp,
        )
        np.testing.assert_array_equal(
            np.asarray(r2d.shift), np.asarray(r1d.shift)
        )
        for fld in ("early_index", "late_index", "diff"):
            np.testing.assert_array_equal(
                np.asarray(getattr(r2d, fld))[:h],
                np.asarray(getattr(r1d, fld))[:h],
                err_msg=fld,
            )
        assert float(r2d.stats.median) == float(r1d.stats.median)
        np.testing.assert_allclose(
            float(r2d.stats.mean), float(r1d.stats.mean), atol=1e-6
        )
        np.testing.assert_allclose(
            float(r2d.stats.std), float(r1d.stats.std), atol=1e-6
        )
        assert float(r2d.stats.min) == float(r1d.stats.min)
        assert float(r2d.stats.max) == float(r1d.stats.max)

    def test_2d_column_padding(self, rng):
        """Column padding masked out of every stat; shift still exact."""
        from rgnir_tpu.parallel.change import change_detection_mosaic
        from rgnir_tpu.parallel.mesh import make_mesh

        h, w = 96, 50  # 50 pads to 52 over 2 column devices
        roll = (3, -2)
        early, late = self._pair(rng, h, w, roll=roll)
        r2d = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDVI",
            mesh=make_mesh((4, 2), ("dr", "dc")), halo=12, proxy_stride=1,
        )
        r1d = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDVI",
            mesh=make_mesh((1,), ("d",)), halo=12, proxy_stride=1,
            pad_to=h,
        )
        shift2, shift1 = np.asarray(r2d.shift), np.asarray(r1d.shift)
        assert tuple(shift2) == (-roll[0], -roll[1]), shift2
        assert tuple(shift1) == (-roll[0], -roll[1]), shift1
        # Same shift -> identical warp arithmetic -> identical maps.
        np.testing.assert_array_equal(
            np.asarray(r2d.diff)[:h, :w], np.asarray(r1d.diff)[:h, :w]
        )
        assert float(r2d.stats.median) == float(r1d.stats.median)
        assert float(r2d.stats.min) == float(r1d.stats.min)
        assert float(r2d.stats.max) == float(r1d.stats.max)
        np.testing.assert_allclose(
            float(r2d.stats.mean), float(r1d.stats.mean), atol=1e-6
        )

    def test_strided_proxy_2d(self, rng):
        """stride-2 proxy on a 2-D mesh: shift recovered, interior clean."""
        from rgnir_tpu.parallel.change import change_detection_mosaic
        from rgnir_tpu.parallel.mesh import make_mesh

        h, w = 1152, 128
        roll = (8, 4)
        early, late = self._pair(rng, h, w, roll=roll)
        res = change_detection_mosaic(
            jnp.asarray(early), jnp.asarray(late), "NDWI",
            mesh=make_mesh((4, 2), ("dr", "dc")), halo=24, proxy_stride=2,
        )
        shift = np.asarray(res.shift)
        assert tuple(shift) == (-roll[0], -roll[1]), shift
        diff = np.asarray(res.diff)[:h, :w]
        interior = diff[16:-16, 16:-16]
        assert np.abs(interior).max() < 1e-6
        assert abs(float(res.stats.median)) < 1e-6


class TestShardedPallasMedian:
    """Distributed Pallas radix-select (kernels.select
    .masked_median_pallas_sharded) vs numpy on the virtual mesh."""

    @pytest.mark.parametrize("h", [56, 49])  # even/odd valid rows
    def test_matches_numpy(self, rng, h):
        from jax.sharding import PartitionSpec as P

        from rgnir_tpu.kernels.select import masked_median_pallas_sharded

        mesh = local_mesh("d")
        n_dev = mesh.devices.size
        w = 64
        hp = ((h + n_dev - 1) // n_dev) * n_dev
        vals = rng.normal(size=(h, w)).astype(np.float32)
        padded = np.zeros((hp, w), np.float32)
        padded[:h] = vals
        bh = hp // n_dev
        n_valid = h * w

        def shard_fn(tile):
            row0 = jax.lax.axis_index("d") * bh
            rows_live = jnp.clip(h - row0, 0, bh)
            return masked_median_pallas_sharded(
                tile, n_valid, rows_live * w, "d"
            )

        med = jax.jit(jax.shard_map(
            shard_fn, mesh=mesh, in_specs=P("d"), out_specs=P(),
            check_vma=False,
        ))(jnp.asarray(padded))
        assert float(med) == float(np.median(vals))

    @pytest.mark.parametrize("h", [56, 49])  # even/odd valid rows
    @pytest.mark.parametrize("with_r0", [False, True])
    def test_quantized_matches_numpy(self, rng, h, with_r0):
        """q24 sharded select on index-like values (uint8 band pairs,
        heavy ties), with and without a precomputed global round-0
        histogram — the mosaic shard bodies' production path."""
        from jax.sharding import PartitionSpec as P

        from rgnir_tpu.kernels.select import masked_median_pallas_sharded

        mesh = local_mesh("d")
        n_dev = mesh.devices.size
        w = 64
        hp = ((h + n_dev - 1) // n_dev) * n_dev
        a = rng.integers(0, 256, (h, w)).astype(np.float32)
        b = rng.integers(0, 256, (h, w)).astype(np.float32)
        a[: h // 3] = b[: h // 3] = 7.0  # constant region -> key ties
        vals = np.clip(
            (a - b) / (a + b + np.float32(1e-10)), -1.0, 1.0
        ).astype(np.float32)
        padded = np.zeros((hp, w), np.float32)
        padded[:h] = vals
        bh = hp // n_dev
        n_valid = h * w
        if with_r0:
            key = np.minimum(
                ((vals + np.float32(1.0)) * np.float32(2.0**23))
                .astype(np.int64) >> 16,
                255,
            )
            r0 = jnp.asarray(
                np.bincount(key.ravel(), minlength=256).astype(np.int32)
            )
        else:
            r0 = None

        def shard_fn(tile):
            row0 = jax.lax.axis_index("d") * bh
            rows_live = jnp.clip(h - row0, 0, bh)
            return masked_median_pallas_sharded(
                tile, n_valid, rows_live * w, "d",
                quantized=True, round0_hist=r0,
            )

        med = jax.jit(jax.shard_map(
            shard_fn, mesh=mesh, in_specs=P("d"), out_specs=P(),
            check_vma=False,
        ))(jnp.asarray(padded))
        assert float(med) == float(np.median(vals))

    def test_ties_even_n(self, rng):
        """Duplicated values around the middle ranks exercise the
        eq_minus_rank tie fast path of the even-n successor."""
        from jax.sharding import PartitionSpec as P

        from rgnir_tpu.kernels.select import masked_median_pallas_sharded

        mesh = local_mesh("d")
        n_dev = mesh.devices.size
        h, w = 8 * n_dev, 16  # no padding; even n
        vals = rng.choice(
            [-1.0, -0.25, 0.0, 0.0, 0.25, 1.0], size=(h, w)
        ).astype(np.float32)
        bh = h // n_dev
        n_valid = h * w

        def shard_fn(tile):
            return masked_median_pallas_sharded(
                tile, n_valid, jnp.int32(bh * w), "d"
            )

        med = jax.jit(jax.shard_map(
            shard_fn, mesh=mesh, in_specs=P("d"), out_specs=P(),
            check_vma=False,
        ))(jnp.asarray(vals))
        assert float(med) == float(np.median(vals))

    @pytest.mark.parametrize("h,w", [(50, 60), (49, 45)])  # even/odd n
    def test_rectangular_layout_2d_mesh(self, rng, h, w):
        """live_rc masking: row AND column padding on a 2-D mesh."""
        from jax.sharding import PartitionSpec as P

        from rgnir_tpu.kernels.select import masked_median_pallas_sharded
        from rgnir_tpu.parallel import make_mesh

        mesh = make_mesh((4, 2), ("dr", "dc"))
        hp = ((h + 3) // 4) * 4
        wp = ((w + 1) // 2) * 2
        vals = rng.normal(size=(h, w)).astype(np.float32)
        padded = np.zeros((hp, wp), np.float32)
        padded[:h, :w] = vals
        bh, bw = hp // 4, wp // 2
        n_valid = h * w

        def shard_fn(tile):
            row0 = jax.lax.axis_index("dr") * bh
            col0 = jax.lax.axis_index("dc") * bw
            return masked_median_pallas_sharded(
                tile, n_valid, None, ("dr", "dc"),
                live_rc=(
                    jnp.clip(h - row0, 0, bh), jnp.clip(w - col0, 0, bw)
                ),
            )

        med = jax.jit(jax.shard_map(
            shard_fn, mesh=mesh, in_specs=P("dr", "dc"), out_specs=P(),
            check_vma=False,
        ))(jnp.asarray(padded))
        assert float(med) == float(np.median(vals))


class TestMultihostDataPlane:
    """Single-process exercise of the multi-host shard feeding path —
    the same per-process code a pod runs (process_count 1 here, so the
    local band is the whole mosaic)."""

    def test_initialize_single_process_noop(self):
        from rgnir_tpu.parallel import initialize_distributed

        initialize_distributed()  # must not raise or reconfigure
        initialize_distributed()  # idempotent
        assert jax.process_count() == 1
        # explicit arguments that cannot be honored must NOT be
        # swallowed (here: the XLA backend is already initialized)
        with pytest.raises((RuntimeError, ValueError)):
            initialize_distributed("127.0.0.1:1", 1, 0)

    def test_band_and_assembly_roundtrip(self, rng):
        from rgnir_tpu.parallel import (
            mosaic_from_local_rows,
            padded_height,
            process_row_band,
            row_sharding,
        )

        mesh = local_mesh("rows")
        h, w = 50, 32  # 50 rows -> padded to 56 over 8 devices
        hp = padded_height(h, mesh)
        assert hp % mesh.devices.size == 0
        img = rng.integers(0, 256, (hp, w, 3), dtype=np.uint8)
        lo, hi = process_row_band(hp, mesh)
        assert (lo, hi) == (0, hp)  # single process owns every block
        arr = mosaic_from_local_rows(img[lo:hi], (hp, w, 3), mesh)
        assert arr.shape == (hp, w, 3)
        assert arr.sharding == row_sharding(mesh)
        np.testing.assert_array_equal(np.asarray(arr), img)

    @pytest.mark.parametrize("impl", ["jnp", "kernel"])
    def test_assembled_mosaic_analyzes_exactly(self, rng, impl):
        """h=50 is NOT a device multiple: the band cut pre-pads rows to
        56, and valid_rows must mask the pre-pad out of every stat."""
        from rgnir_tpu.parallel import (
            mosaic_from_local_rows,
            padded_height,
            process_row_band,
        )
        from rgnir_tpu.pipeline.fused import analyze_image

        mesh = local_mesh("rows")
        h, w = 50, 128
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        hp = padded_height(h, mesh)
        assert hp != h
        padded = np.zeros((hp, w, 3), np.uint8)
        padded[:h] = img
        lo, hi = process_row_band(hp, mesh)
        arr = mosaic_from_local_rows(padded[lo:hi], (hp, w, 3), mesh)
        res = analyze_mosaic(
            arr, kinds=("NDVI",), mesh=mesh, impl=impl, valid_rows=h
        )
        single = analyze_image(jnp.asarray(img), kinds=("NDVI",))
        got = to_analyze_index_dict(res.stats["NDVI"], "NDVI")
        want = to_analyze_index_dict(single.stats["NDVI"], "NDVI")
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=0, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(res.wb)[:h], np.asarray(single.wb)
        )

    def test_valid_rows_2d_mesh(self, rng):
        from rgnir_tpu.parallel import make_mesh
        from rgnir_tpu.pipeline.fused import analyze_image

        mesh = make_mesh((4, 2), ("dr", "dc"))
        h, w = 50, 96
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        hp = 52  # caller pre-pads rows to a 4-multiple
        padded = np.zeros((hp, w, 3), np.uint8)
        padded[:h] = img
        res = analyze_mosaic(
            jnp.asarray(padded), kinds=("NDWI",), mesh=mesh, valid_rows=h
        )
        single = analyze_image(jnp.asarray(img), kinds=("NDWI",))
        got = to_analyze_index_dict(res.stats["NDWI"], "NDWI")
        want = to_analyze_index_dict(single.stats["NDWI"], "NDWI")
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=0, atol=1e-6)


class TestOddMeshes:
    """Non-power-of-two device counts (round-4 verdict item 8): the
    driver dryrun only ever sees 8 virtual devices, but production pods
    can present any count — {3, 5, 6} exercise the padding/remainder
    paths in parallel/mosaic.py (row counts never divisible by the
    mesh) and, for 6, the 2-D composite-mesh branch. Runs the FULL
    driver dryrun scenario on a subset mesh of the 8-device suite."""

    @pytest.mark.parametrize("n", [3, 5, 6])
    def test_dryrun_multichip(self, n):
        import sys
        from pathlib import Path

        repo = str(Path(__file__).resolve().parents[1])
        if repo not in sys.path:
            sys.path.insert(0, repo)
        import __graft_entry__ as g

        g.dryrun_multichip(n)

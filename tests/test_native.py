"""Native frame-ring tests: cross-process SPSC streaming ingestion."""

import multiprocessing as mp
import os
import time

import numpy as np
import pytest

from rgnir_tpu.native import FrameRing, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++/shm unavailable"
)

# Ring names are pid-unique: two concurrent test sessions otherwise
# collide on the same /dev/shm segment (one session's producer feeds
# the other's consumer — observed as an in-order assertion failure).
_PID = os.getpid()


def _producer_striped(name, shape, count, sid, finish=True):
    """Producer whose frame content encodes (stream, seq): the first
    ``k = 3*sid + seq + 1`` rows have NIR=255/R=0 (NDVI ~ 1 there,
    0 elsewhere), so vegetation coverage == k/H exactly — the consumer
    can verify each result routed to the right (stream, seq)."""
    ring = FrameRing.open(name, shape)
    sent = 0
    while sent < count:
        frame = np.zeros(shape, dtype=np.uint8)
        k = 3 * sid + sent + 1
        frame[:k, :, 2] = 255
        if ring.try_push(frame):
            sent += 1
        else:
            time.sleep(0.0005)
    if finish:
        ring.finish()
    ring.close()


def _producer(name, shape, count, finish=False):
    ring = FrameRing.open(name, shape)
    rng = np.random.default_rng(0)
    sent = 0
    while sent < count:
        frame = rng.integers(0, 256, shape, dtype=np.uint8)
        frame[0, 0, 0] = sent % 256  # sequence tag
        if ring.try_push(frame):
            sent += 1
        else:
            time.sleep(0.0005)
    if finish:
        ring.finish()
    ring.close()


class TestFrameRing:
    def test_push_pop_same_process(self):
        with FrameRing.create(f"/rgnir_test_ring1_{_PID}", (4, 6, 3), capacity=2) as r:
            a = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
            assert r.try_push(a)
            assert r.try_push(a + 1)
            assert not r.try_push(a)  # full
            np.testing.assert_array_equal(r.try_pop(), a)
            np.testing.assert_array_equal(r.try_pop(), a + 1)
            assert r.try_pop() is None  # empty
            assert len(r) == 0 and r.capacity == 2

    def test_cross_process_stream_in_order(self):
        shape, count = (8, 8, 3), 50
        with FrameRing.create(f"/rgnir_test_ring2_{_PID}", shape, capacity=4) as ring:
            proc = mp.get_context("spawn").Process(
                target=_producer, args=(f"/rgnir_test_ring2_{_PID}", shape, count)
            )
            proc.start()
            seen = []
            deadline = time.time() + 30
            while len(seen) < count and time.time() < deadline:
                frame = ring.try_pop()
                if frame is None:
                    time.sleep(0.0005)
                    continue
                seen.append(int(frame[0, 0, 0]))
            proc.join(timeout=10)
            assert seen == [i % 256 for i in range(count)]  # in order, no loss

    def test_eof_terminates_unbounded_consumer(self):
        """finish() after the last push ends a max_frames=None
        run_from_ring consumer with every frame delivered (the loop
        previously could never terminate without a frame count)."""
        from rgnir_tpu.pipeline.streaming import StreamAnalyzer

        shape, count = (8, 8, 3), 7
        with FrameRing.create(f"/rgnir_test_ring_eof_{_PID}", shape,
                              capacity=4) as ring:
            proc = mp.get_context("spawn").Process(
                target=_producer,
                args=(f"/rgnir_test_ring_eof_{_PID}", shape, count, True),
            )
            proc.start()
            analyzer = StreamAnalyzer(frame_shape=shape[:2],
                                      kinds=("NDVI",))
            results = list(analyzer.run_from_ring(ring))  # must terminate
            proc.join(timeout=10)
        assert [r.frame_id for r in results] == list(range(count))

    def test_multi_ring_demux_ordered_lossless(self):
        """4 producer PROCESSES -> 4 rings -> one batched analyzer
        (run_from_rings): every frame of every stream is delivered, in
        per-stream order, routed to the right stream — verified from
        the frame CONTENT (coverage encodes (stream, seq))."""
        from rgnir_tpu.pipeline.streaming import StreamAnalyzer

        shape, count, n_streams = (32, 16, 3), 5, 4
        h = shape[0]
        ctx = mp.get_context("spawn")
        rings, procs = [], []
        try:
            for si in range(n_streams):
                name = f"/rgnir_demux_{_PID}_{si}"
                rings.append(FrameRing.create(name, shape, capacity=3))
                p = ctx.Process(
                    target=_producer_striped, args=(name, shape, count, si)
                )
                p.start()
                procs.append(p)
            analyzer = StreamAnalyzer(
                frame_shape=shape[:2], kinds=("NDVI",), batch=8
            )
            got = list(analyzer.run_from_rings(rings, max_latency_s=0.02))
            for p in procs:
                p.join(timeout=10)
        finally:
            for r in rings:
                r.close()
        assert len(got) == n_streams * count  # lossless
        per_stream = {si: [] for si in range(n_streams)}
        for si, seq, res in got:
            per_stream[si].append((seq, res))
        for si in range(n_streams):
            seqs = [seq for seq, _ in per_stream[si]]
            assert seqs == list(range(count)), f"stream {si} order"
            for seq, res in per_stream[si]:
                cov = float(res.stats["NDVI"].coverage_pct)
                k = round(cov * h / 100.0)
                assert k == 3 * si + seq + 1, (si, seq, cov)

    def test_multi_ring_partial_batch_via_max_frames(self):
        """A batch-8 analyzer fed only 3 frames still delivers all 3
        (latency flush + drain padding), with correct routing."""
        from rgnir_tpu.pipeline.streaming import StreamAnalyzer

        shape = (32, 16, 3)
        with FrameRing.create(f"/rgnir_demux_p0_{_PID}", shape, capacity=4) as r0, \
                FrameRing.create(f"/rgnir_demux_p1_{_PID}", shape, capacity=4) as r1:
            for seq in range(2):
                frame = np.zeros(shape, np.uint8)
                frame[:seq + 1, :, 2] = 255
                assert r0.try_push(frame)
            frame = np.zeros(shape, np.uint8)
            frame[:4, :, 2] = 255  # stream 1, k = 3*1+0+1 = 4
            assert r1.try_push(frame)
            analyzer = StreamAnalyzer(
                frame_shape=shape[:2], kinds=("NDVI",), batch=8
            )
            got = list(analyzer.run_from_rings([r0, r1], max_frames=3))
        assert sorted((si, seq) for si, seq, _ in got) == [
            (0, 0), (0, 1), (1, 0)
        ]
        for si, seq, res in got:
            k = round(float(res.stats["NDVI"].coverage_pct) * 32 / 100.0)
            assert k == 3 * si + seq + 1

    def test_non_uint8_push_rejected(self):
        with FrameRing.create(f"/rgnir_test_ring_dt_{_PID}", (4, 4, 3),
                              capacity=2) as r:
            with pytest.raises(TypeError, match="uint8"):
                r.try_push(np.zeros((4, 4, 3), np.float32))

    def test_shape_mismatch(self):
        with FrameRing.create(f"/rgnir_test_ring3_{_PID}", (4, 4, 3)) as r:
            with pytest.raises(ValueError):
                r.try_push(np.zeros((2, 2, 3), np.uint8))
            with pytest.raises(ValueError):
                FrameRing.open(f"/rgnir_test_ring3_{_PID}", (8, 8, 3))


class TestImgio:
    """Native batch decoder (imgio.cpp): PIL byte parity + arena batch."""

    @pytest.fixture()
    def imgio(self):
        from rgnir_tpu.native import imgio as m

        if not m.native_available():
            pytest.skip(f"imgio unavailable: {m.build_error()}")
        return m

    @pytest.fixture()
    def img(self):
        return np.random.default_rng(3).integers(
            0, 256, (37, 53, 3), dtype=np.uint8
        )

    @pytest.mark.parametrize(
        "name,kwargs",
        [
            ("x.tif", {}),
            ("lzw.tif", {"compression": "tiff_lzw"}),
            ("defl.tif", {"compression": "tiff_adobe_deflate"}),
            ("x.png", {}),
            ("x.jpg", {"quality": 90}),
        ],
    )
    def test_pil_parity_rgb(self, imgio, img, tmp_path, name, kwargs):
        from PIL import Image

        from rgnir_tpu.io.decode import decode_file

        p = tmp_path / name
        Image.fromarray(img).save(p, **kwargs)
        assert imgio.probe(p) == (37, 53)
        np.testing.assert_array_equal(imgio.decode_file(p), decode_file(p))

    def test_pil_parity_modes(self, imgio, img, tmp_path):
        """Gray, palette, and RGBA inputs all match PIL's convert('RGB')
        (alpha DROPPED, not composited)."""
        from PIL import Image

        from rgnir_tpu.io.decode import decode_file

        cases = {
            "gray.png": Image.fromarray(img[:, :, 0]),
            "pal.png": Image.fromarray(img).convert(
                "P", palette=Image.ADAPTIVE
            ),
            "rgba.png": Image.fromarray(
                np.dstack([img, 255 - img[:, :, :1]])
            ),
        }
        for name, pil_img in cases.items():
            p = tmp_path / name
            pil_img.save(p)
            np.testing.assert_array_equal(
                imgio.decode_file(p), decode_file(p), err_msg=name
            )

    def test_decode_batch_arena(self, imgio, img, tmp_path):
        from PIL import Image

        paths = []
        for i in range(5):
            p = tmp_path / f"f{i}.tif"
            Image.fromarray((img + i).astype(np.uint8)).save(p)
            paths.append(p)
        bad = tmp_path / "missing.tif"
        arena, status = imgio.decode_batch(
            paths + [bad], shape=(37, 53), threads=4
        )
        assert arena.shape == (6, 37, 53, 3)
        assert status[:5] == [0] * 5 and status[5] < 0
        for i in range(5):
            np.testing.assert_array_equal(
                arena[i], (img + i).astype(np.uint8)
            )
        assert not arena[5].any()  # failed slot stays zeroed

    def test_dims_mismatch_status(self, imgio, img, tmp_path):
        from PIL import Image

        p = tmp_path / "wrong.tif"
        Image.fromarray(img[:20]).save(p)
        _, status = imgio.decode_batch([p], shape=(37, 53))
        assert status == [-3]

    def test_16bit_rejected_natively_pil_parity(self, imgio, tmp_path):
        """16-bit TIFF/PNG must NOT decode natively: libtiff/libpng
        *rescale* 16-bit samples while PIL clamps >255, so the native
        layer returns 'unsupported format' and decode_file_fast falls
        back to PIL — pixel values identical to the pure-PIL path
        (advisor round-2 high finding)."""
        from PIL import Image

        from rgnir_tpu.io.decode import decode_file, decode_file_fast

        hi = np.array(
            [[0, 16, 32, 48], [255, 300, 4096, 65535]], dtype=np.uint16
        )
        for name, fmt in [("d16.tif", "TIFF"), ("d16.png", "PNG")]:
            p = tmp_path / name
            Image.fromarray(hi).save(p, format=fmt)
            with pytest.raises(OSError, match="unsupported format"):
                imgio.probe(p)
            with pytest.raises(OSError, match="unsupported format"):
                imgio.decode_file(p)
            np.testing.assert_array_equal(
                decode_file_fast(p), decode_file(p), err_msg=name
            )
        _, status = imgio.decode_batch(
            [tmp_path / "d16.tif", tmp_path / "d16.png"], shape=(2, 4)
        )
        assert status == [-4, -4]

    def test_float_tiff_rejected_natively(self, imgio, tmp_path):
        """Float32 TIFFs also route to the PIL fallback (sample-format
        gate, not just bit depth)."""
        from PIL import Image

        p = tmp_path / "f32.tif"
        Image.fromarray(
            np.linspace(0, 1, 12, dtype=np.float32).reshape(3, 4)
        ).save(p)
        with pytest.raises(OSError, match="unsupported format"):
            imgio.probe(p)

    @pytest.mark.parametrize("level", [0, 1, 6])
    def test_encode_png_rgb_pil_roundtrip(self, imgio, img, level):
        """Native libpng encode (filter NONE) must round-trip through
        PIL to identical pixels at every zlib level the writers use."""
        import io as _io

        from PIL import Image

        data = imgio.encode_png_rgb(img, level)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        back = np.asarray(Image.open(_io.BytesIO(data)))
        np.testing.assert_array_equal(back, img)

    @pytest.mark.parametrize("level", [1, 6])
    def test_encode_png_rgb_fast_roundtrip(self, imgio, img, level):
        """The fast mode (filter SUB + Z_RLE) must decode to the same
        pixels as the default mode — PNG is lossless under any
        filter/strategy choice, but the SUB reconstruction is the
        decoder's job, so round-trip it explicitly."""
        import io as _io

        from PIL import Image

        data = imgio.encode_png_rgb(img, level, fast=True)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        back = np.asarray(Image.open(_io.BytesIO(data)))
        np.testing.assert_array_equal(back, img)

    def test_encode_tiff_rgb_pil_roundtrip(self, imgio, img, tmp_path):
        """Native libtiff uncompressed write must round-trip through
        PIL to identical pixels (the WB output contract — the
        reference writes PIL-default .tif, backend-process.py:57)."""
        from PIL import Image

        p = tmp_path / "wb.tif"
        imgio.encode_tiff_rgb(p, img)
        back = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(back, img)
        # our own decoder reads it too (arena/loader path)
        assert imgio.probe(p) == img.shape[:2]  # (height, width)

    def test_encode_tiff_rgb_odd_rows(self, imgio, tmp_path):
        """Heights not divisible by the strip size exercise the
        partial-strip tail."""
        from PIL import Image

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (67, 33, 3), dtype=np.uint8)
        p = tmp_path / "odd.tif"
        imgio.encode_tiff_rgb(p, img)
        back = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(back, img)

    def test_encode_png_rgb_rejects_bad_input(self, imgio, img):
        with pytest.raises(ValueError):
            imgio.encode_png_rgb(img[..., 0])  # not 3-channel
        with pytest.raises(ValueError):
            imgio.encode_png_rgb(img.astype(np.uint16))

    def test_decode_file_fast_fallback(self, tmp_path, img):
        """decode_file_fast: native result == PIL; non-image falls back
        to PIL's error (not a native crash)."""
        from PIL import Image

        from rgnir_tpu.io.decode import decode_file, decode_file_fast

        p = tmp_path / "a.tif"
        Image.fromarray(img).save(p)
        np.testing.assert_array_equal(decode_file_fast(p), decode_file(p))
        junk = tmp_path / "junk.tif"
        junk.write_bytes(b"not an image at all")
        with pytest.raises(Exception):
            decode_file_fast(junk)


class TestJointHist:
    """Native host joint-histogram accumulator (jointhist.cpp): the
    exact-counts contract the streamed gigapixel host reduce relies on
    (pipeline/gigapixel.py reduce='host')."""

    @pytest.fixture()
    def jointhist(self):
        from rgnir_tpu.native import jointhist

        if not jointhist.native_available():
            pytest.skip("jointhist toolchain unavailable")
        return jointhist

    def _numpy_joint(self, flat, pairs):
        out = np.zeros((len(pairs), 256, 256), np.uint32)
        for p, (ia, ib) in enumerate(pairs):
            key = (flat[:, ia].astype(np.uint32) << 8) | flat[:, ib]
            out[p] = np.bincount(key, minlength=65536).reshape(256, 256)
        return out

    @pytest.mark.parametrize("pairs", [
        ((0, 2),), ((0, 2), (1, 2)), ((2, 0), (0, 0)),
    ])
    def test_matches_numpy(self, jointhist, pairs):
        rng = np.random.default_rng(11)
        flat = rng.integers(0, 256, (10007, 3), dtype=np.uint8)
        got = jointhist.accumulate(flat, pairs)
        np.testing.assert_array_equal(got, self._numpy_joint(flat, pairs))
        assert got.sum(axis=(1, 2)).tolist() == [flat.shape[0]] * len(pairs)

    def test_accumulates_into_out(self, jointhist):
        rng = np.random.default_rng(12)
        a = rng.integers(0, 256, (513, 3), dtype=np.uint8)
        b = rng.integers(0, 256, (777, 3), dtype=np.uint8)
        out = jointhist.accumulate(a, ((0, 2),))
        jointhist.accumulate(b, ((0, 2),), out=out)
        both = self._numpy_joint(np.concatenate([a, b]), ((0, 2),))
        np.testing.assert_array_equal(out, both)

    def test_run_heavy_data_matches_numpy(self, jointhist):
        """The single-pair path coalesces runs of equal (a, b) bins
        into one hist update (jointhist.cpp) — verify exact counts on
        data built of long runs, including a run spanning the whole
        tail (final-run flush) and single-element runs."""
        rng = np.random.default_rng(14)
        base = rng.integers(0, 256, 501, dtype=np.uint8).repeat(37)
        flat = np.stack([base, base[::-1], base ^ 85], axis=1).copy()
        got = jointhist.accumulate(flat, ((0, 2),))
        np.testing.assert_array_equal(
            got, self._numpy_joint(flat, ((0, 2),))
        )
        # constant input: one run covering every row
        const = np.full((4096, 3), 7, np.uint8)
        got = jointhist.accumulate(const, ((0, 1),))
        assert got[0, 7, 7] == 4096 and got.sum() == 4096

    def test_simd_adaptive_path_matches_numpy(self, jointhist):
        """Bands >= 2^16 pixels probe their content and may take the
        AVX-512 gather + coalesced sweep (jointhist.cpp
        simd_coalesced_range; scalar loop on hosts without VBMI).
        Exercise every probe outcome at awkward (non-multiple-of-16)
        sizes: run-heavy (SIMD), palette-like 2-bin ripple (SIMD via
        the distinct-bin rule), uniform noise (scalar), and both pair
        orders — counts must be exact in all of them."""
        rng = np.random.default_rng(15)
        n = (1 << 17) + 13  # above the probe floor, ragged SIMD tail
        runs = np.repeat(
            rng.integers(0, 256, (n // 64 + 1, 3), dtype=np.uint8), 64,
            axis=0,
        )[:n].copy()
        ripple = np.empty((n, 3), np.uint8)
        ripple[0::2] = 37
        ripple[1::2] = 201
        noise = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        for flat in (runs, ripple, noise):
            for pairs in (((0, 2),), ((2, 1),)):
                got = jointhist.accumulate(flat, pairs)
                np.testing.assert_array_equal(
                    got, self._numpy_joint(flat, pairs)
                )

    def test_multithreaded_equals_single(self, jointhist):
        # force the threaded path (n >= 1<<22 rows)
        rng = np.random.default_rng(13)
        flat = rng.integers(0, 256, ((1 << 22) + 99, 2), dtype=np.uint8)
        one = jointhist.accumulate(flat, ((0, 1),), n_threads=1)
        many = jointhist.accumulate(flat, ((0, 1),), n_threads=4)
        np.testing.assert_array_equal(one, many)

    def test_rejects_bad_args(self, jointhist):
        flat = np.zeros((8, 3), np.uint8)
        with pytest.raises(ValueError):
            jointhist.accumulate(flat.astype(np.uint16), ((0, 1),))
        with pytest.raises(ValueError):
            jointhist.accumulate(flat, ((0, 3),))  # channel out of range
        with pytest.raises(ValueError):
            jointhist.accumulate(
                flat, ((0, 1),),
                out=np.zeros((1, 256, 256), np.int64),  # wrong dtype
            )

    def test_numpy_fallback_path(self, monkeypatch):
        """With the native lib forced unavailable, accumulate() still
        returns identical counts via bincount."""
        from rgnir_tpu.native import jointhist as jh

        rng = np.random.default_rng(14)
        flat = rng.integers(0, 256, (4099, 3), dtype=np.uint8)
        want = jh.accumulate(flat, ((1, 2),))
        monkeypatch.setattr(jh._NATIVE, "load", lambda: None)
        got = jh.accumulate(flat, ((1, 2),))
        np.testing.assert_array_equal(got, want)

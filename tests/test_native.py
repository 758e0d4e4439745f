"""Native frame-ring tests: cross-process SPSC streaming ingestion."""

import multiprocessing as mp
import time

import numpy as np
import pytest

from rgnir_tpu.native import FrameRing, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++/shm unavailable"
)


def _producer(name, shape, count):
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
    ring.close()


class TestFrameRing:
    def test_push_pop_same_process(self):
        with FrameRing.create("/rgnir_test_ring1", (4, 6, 3), capacity=2) as r:
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
        with FrameRing.create("/rgnir_test_ring2", shape, capacity=4) as ring:
            proc = mp.get_context("spawn").Process(
                target=_producer, args=("/rgnir_test_ring2", shape, count)
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

    def test_shape_mismatch(self):
        with FrameRing.create("/rgnir_test_ring3", (4, 4, 3)) as r:
            with pytest.raises(ValueError):
                r.try_push(np.zeros((2, 2, 3), np.uint8))
            with pytest.raises(ValueError):
                FrameRing.open("/rgnir_test_ring3", (8, 8, 3))

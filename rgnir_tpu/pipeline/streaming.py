"""Streaming UAV session analysis (BASELINE config 4: 1080p @ 30 fps,
all three indices + per-frame stats).

The reference has no streaming mode at all — its closest path decodes
and processes one file at a time synchronously. ``StreamAnalyzer`` keeps
a jit-compiled fused pass warm for a fixed frame shape and pipelines
device dispatch against host post-processing: ``submit()`` enqueues a
frame and returns immediately (device runs async); results are fetched
one step behind, so at steady state the host never blocks on the device
and vice versa. Per-frame budget at 30 fps is 33 ms; the fused pass
needs ~2 ms for 1080p on a v5e chip, so a single chip sustains ~15
parallel 30 fps streams.
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Deque, Dict, Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from rgnir_tpu.config import ALL_INDICES, IndexKind
from rgnir_tpu.ops.stats import IndexStats


@dataclasses.dataclass
class FrameResult:
    frame_id: int
    stats: Dict[str, IndexStats]           # device scalars (fetch lazily)
    renders: Optional[Dict[str, jax.Array]]  # device uint8 renders


class StreamAnalyzer:
    """Fixed-shape streaming analyzer with one-deep pipelining.

    ``batch`` > 1 groups frames (from one high-rate stream or several
    multiplexed streams) into a single device dispatch: per-frame
    1080p passes run ~1.4 GPix/s on a v5e chip, batched passes 2-3x
    that, so batching directly multiplies the sustainable stream
    count. Results keep per-frame granularity — each completed batch
    enqueues one FrameResult per frame (device-array slices; fetch
    lazily). Latency trades accordingly: a frame waits for its batch
    to fill, so keep ``batch`` <= streams x fps x latency-budget.
    """

    def __init__(
        self,
        frame_shape: Tuple[int, int] = (1080, 1920),
        kinds: Sequence[Union[IndexKind, str]] = ALL_INDICES,
        with_renders: bool = False,
        depth: int = 2,
        batch: int = 1,
        with_hist: bool = False,
    ):
        self.kinds = tuple(IndexKind.parse(k).value for k in kinds)
        self.with_renders = with_renders
        self.frame_shape = frame_shape
        self.depth = depth
        self.batch = max(1, int(batch))
        self._staged: list = []
        self._inflight: Deque[FrameResult] = collections.deque()
        self._next_id = 0

        def step(frames):
            from rgnir_tpu.pipeline.dispatch import analyze_image_auto

            # with_hist=False by default: per-frame stream consumers
            # read the analyze_index stat dict, which has no histogram.
            res = analyze_image_auto(
                frames, kinds=self.kinds, with_renders=with_renders,
                with_hist=with_hist,
            )
            return res.stats, res.renders

        self._step = step

    def warmup(self) -> None:
        """Compile once on a dummy batch so the first real frame is fast."""
        dummy = jnp.zeros((self.batch,) + self.frame_shape + (3,), jnp.uint8)
        stats, renders = self._step(dummy)
        jax.block_until_ready(stats)

    def _dispatch_staged(self) -> None:
        block = jnp.asarray(np.stack(self._staged))
        self._staged.clear()
        stats, renders = self._step(block)
        b = block.shape[0]
        for j in range(b):
            stats_j = jax.tree.map(lambda a, j=j: a[j], stats)
            renders_j = (
                {k: v[j] for k, v in renders.items()}
                if self.with_renders else None
            )
            self._inflight.append(
                FrameResult(self._next_id, stats_j, renders_j)
            )
            self._next_id += 1

    def submit(self, frame: np.ndarray) -> Optional[FrameResult]:
        """Enqueue a frame; returns the oldest completed result once the
        pipeline is full (None while filling)."""
        if frame.shape != self.frame_shape + (3,):
            raise ValueError(
                f"frame shape {frame.shape} != {self.frame_shape + (3,)}"
            )
        self._staged.append(np.asarray(frame))
        if len(self._staged) >= self.batch:
            self._dispatch_staged()
        if len(self._inflight) > self.depth * self.batch:
            return self._inflight.popleft()
        return None

    def flush_partial(self) -> None:
        """Dispatch a partially-filled batch now (latency policy hook).

        Pads the staged frames to the compiled batch shape with zero
        frames — whose results are dropped — so no new executable
        compiles. Used by the multi-ring demux when frames have waited
        longer than its latency budget; harmless when nothing is
        staged.
        """
        if not self._staged:
            return
        real = len(self._staged)
        while len(self._staged) < self.batch:
            self._staged.append(
                np.zeros(self.frame_shape + (3,), np.uint8)
            )
        drop_after = self._next_id + real
        self._dispatch_staged()
        self._next_id = drop_after
        while self._inflight and self._inflight[-1].frame_id >= drop_after:
            self._inflight.pop()

    def pop_ready(self):
        """Yield completed results beyond the pipelining depth (never
        blocks the device: FrameResult arrays are fetched lazily)."""
        while len(self._inflight) > self.depth * self.batch:
            yield self._inflight.popleft()

    def drain(self):
        """Flush any partial batch, then yield all remaining results."""
        self.flush_partial()
        while self._inflight:
            yield self._inflight.popleft()

    def run_from_rings(
        self,
        rings: Sequence,
        max_frames: Optional[int] = None,
        idle_sleep_s: float = 0.0005,
        max_latency_s: float = 0.05,
    ):
        """Demultiplex N producer rings into this (batched) analyzer.

        The production multi-camera topology: one shared-memory
        FrameRing per producer process, one batched device pipeline.
        Yields ``(stream_index, per_stream_seq, FrameResult)`` tuples.

        Policies:
          - **Fairness**: round-robin, at most one frame per ring per
            sweep — a fast producer cannot starve a slow one, and
            per-stream order is preserved exactly (ring order is
            submission order is result order).
          - **Latency**: when a partial batch has waited longer than
            ``max_latency_s`` with no new frames arriving, it is
            flushed (padded to the compiled batch shape) rather than
            held until the batch fills — bounded latency under bursty
            or unbalanced producers.
          - **EOF**: a ring is retired after its producer's
            ``finish()`` flag is observed AND one further empty pop
            proves it drained (the release/acquire ordering of
            fr_finish guarantees no frame can be missed). The
            generator ends when every ring has retired (or after
            ``max_frames`` total frames).
        """
        import time as _time

        n_rings = len(rings)
        seqs = [0] * n_rings
        eof_seen = [False] * n_rings
        done = [False] * n_rings
        order: Deque[Tuple[int, int]] = collections.deque()
        consumed = 0
        staged_since: Optional[float] = None

        def route(result):
            si, seq = order.popleft()
            return si, seq, result

        while not all(done):
            if max_frames is not None and consumed >= max_frames:
                break
            progress = False
            for si, ring in enumerate(rings):
                if done[si]:
                    continue
                frame = ring.try_pop()
                if frame is None:
                    if eof_seen[si]:
                        done[si] = True
                    elif getattr(ring, "eof", False):
                        eof_seen[si] = True  # re-pop once more next sweep
                    continue
                eof_seen[si] = False
                progress = True
                order.append((si, seqs[si]))
                seqs[si] += 1
                consumed += 1
                if staged_since is None:
                    staged_since = _time.monotonic()
                result = self.submit(frame)
                if not self._staged:
                    staged_since = None
                if result is not None:
                    yield route(result)
                if max_frames is not None and consumed >= max_frames:
                    break
            if not progress:
                if (
                    staged_since is not None
                    and _time.monotonic() - staged_since > max_latency_s
                ):
                    self.flush_partial()
                    staged_since = None
                    for r in self.pop_ready():
                        yield route(r)
                elif not all(done):
                    _time.sleep(idle_sleep_s)
        for r in self.drain():
            yield route(r)

    def run_from_ring(self, ring, max_frames: Optional[int] = None,
                      idle_sleep_s: float = 0.0005):
        """Consume frames from a native shared-memory FrameRing
        (rgnir_tpu.native) — the production camera->analyzer hand-off —
        yielding FrameResults as the pipeline produces them. Stops after
        ``max_frames`` frames, or — with ``max_frames=None`` — when the
        producer calls ``ring.finish()`` and the ring drains (the ring's
        release/acquire eof flag guarantees every frame pushed before
        ``finish`` is seen first)."""
        import time as _time

        consumed = 0
        eof_seen = False
        while max_frames is None or consumed < max_frames:
            frame = ring.try_pop()
            if frame is None:
                if eof_seen:
                    break  # empty pop AFTER observing eof: stream done
                if max_frames is None and getattr(ring, "eof", False):
                    # Re-pop once more: frames pushed before finish()
                    # are ordered before the eof flag, so one further
                    # empty pop proves the ring is truly drained.
                    eof_seen = True
                    continue
                _time.sleep(idle_sleep_s)
                continue
            eof_seen = False
            consumed += 1
            result = self.submit(frame)
            if result is not None:
                yield result
        yield from self.drain()

"""Honest TPU micro-benchmark harness for this tunneled environment.

Remote/tunneled devices can return from ``block_until_ready`` before
execution completes, so naive timing is bogus. ``chain_time``
runs a data-dependent body inside one ``lax.fori_loop``, forces a host
fetch, and reports the slope between two iteration counts — fixed
dispatch/RTT cancels out.

Usage: import { chain_time } and pass a ``body(i, carry) -> carry``.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Tuple

import numpy as np

import jax


def _touch(out: Any) -> None:
    """Block until ``out`` is computed — WITHOUT fetching it wholesale.

    ``np.asarray(a)`` would ship the entire carry (tens of MB) through
    the tunnel per timing call; that transfer's latency variance is
    larger than the sub-ms signals being measured and once produced
    negative slopes. Reduce to one element on device, fetch 4 bytes —
    the fetch still blocks on the producing computation.
    """
    import jax.numpy as jnp

    jax.tree.map(lambda a: np.asarray(jnp.ravel(a)[0]), out)


def chain_time(
    body: Callable[[Any, Any], Any],
    carry0: Any,
    ns: Tuple[int, int] = (10, 60),
    reps: int = 3,
    rel_tol: float = 0.05,
    max_reps: int = 12,
) -> float:
    """ms per iteration of ``body``.

    Slope method with jitter hardening: the tunnel adds hundreds of ms
    of random per-call latency, so a single (A, B) pair can even give a
    negative slope. We alternate A,B,A,B,... and take the slope of the
    per-n minima — min is the right estimator for a fixed cost plus
    positive noise. Because each per-n min converges monotonically, the
    slope converges too: after the ``reps`` mandatory pairs we keep
    going until the slope is positive and stable within ``rel_tol`` for
    two consecutive pairs (or ``max_reps``), which rejects the
    single-window flukes that previously produced physically impossible
    readings (e.g. a whole-pipeline step "faster" than its own HBM
    traffic floor).
    """

    @jax.jit
    def run(c, n):
        return jax.lax.fori_loop(0, n, body, c)

    # compile + warm both iteration counts
    for n in ns:
        _touch(run(carry0, n))

    best = {n: float("inf") for n in ns}
    slope = None
    stable = 0
    for rep in range(max(max_reps, reps)):
        for n in ns:
            t0 = time.perf_counter()
            _touch(run(carry0, n))
            best[n] = min(best[n], time.perf_counter() - t0)
        new = (best[ns[1]] - best[ns[0]]) / (ns[1] - ns[0]) * 1e3
        if rep + 1 >= max(2, reps) and slope is not None:
            if new > 0 and abs(new - slope) <= rel_tol * new:
                stable += 1
                if stable >= 2:
                    return new
            else:
                stable = 0
        slope = new
    if slope is None or slope <= 0:
        print(
            f"chain_time: degenerate slope {slope} after {max_reps} pairs "
            "(contended window?) — treat with suspicion",
            file=__import__("sys").stderr,
        )
    return slope


def chain_time_ab(
    bodies: dict,
    carry0: Any,
    ns: Tuple[int, int] = (10, 60),
    reps: int = 6,
) -> dict:
    """Interleaved A/B slope timing: ms per iteration for each body.

    Cross-run absolutes on this shared chip are incomparable (throughput
    swings several-fold between minutes), so variant comparisons MUST
    interleave: every rep times every (variant, n) back to back, and the
    per-cell minima see the same contention distribution. Use this — not
    two chain_time calls — whenever deciding between implementations.
    """
    runs = {}
    for k, b in bodies.items():
        runs[k] = jax.jit(
            lambda c, n, _b=b: jax.lax.fori_loop(0, n, _b, c)
        )
    for k in bodies:  # compile + warm every cell
        for n in ns:
            _touch(runs[k](carry0, n))
    best = {(k, n): float("inf") for k in bodies for n in ns}
    for _ in range(max(2, reps)):
        for n in ns:
            for k in bodies:
                t0 = time.perf_counter()
                _touch(runs[k](carry0, n))
                best[(k, n)] = min(best[(k, n)], time.perf_counter() - t0)
    return {
        k: (best[(k, ns[1])] - best[(k, ns[0])]) / (ns[1] - ns[0]) * 1e3
        for k in bodies
    }

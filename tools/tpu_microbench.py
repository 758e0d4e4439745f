"""Honest TPU micro-benchmark harness for this tunneled environment.

``block_until_ready`` returns early through the axon tunnel, so naive
timing is bogus (see .claude/skills/verify/SKILL.md). ``chain_time``
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
    jax.tree.map(lambda a: np.asarray(a).ravel()[0], out)


def chain_time(
    body: Callable[[Any, Any], Any],
    carry0: Any,
    ns: Tuple[int, int] = (10, 60),
    reps: int = 3,
) -> float:
    """ms per iteration of ``body`` (slope method, min over reps)."""

    @jax.jit
    def run(c, n):
        return jax.lax.fori_loop(0, n, body, c)

    best = {}
    for n in ns:
        _touch(run(carry0, n))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _touch(run(carry0, n))
            ts.append(time.perf_counter() - t0)
        best[n] = min(ts)
    return (best[ns[1]] - best[ns[0]]) / (ns[1] - ns[0]) * 1e3

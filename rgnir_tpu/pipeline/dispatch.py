"""Implementation dispatch: Pallas kernels on TPU, jnp elsewhere.

Both paths are parity-tested against each other (bit-exact outputs);
the kernel path avoids HBM round-trips for one-hots and is ~2-3x
faster on TPU, while the jnp path compiles everywhere (and is what the
CPU test mesh runs). Override with RGNIR_FORCE_IMPL=kernel|jnp.
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple, Union

import jax

from rgnir_tpu.config import ALL_INDICES, IndexKind
from rgnir_tpu.pipeline.fused import AnalyzeResult, analyze_image_jit


def use_kernels() -> bool:
    forced = os.environ.get("RGNIR_FORCE_IMPL", "")
    if forced == "kernel":
        return True
    if forced == "jnp":
        return False
    # TPU only: the Pallas kernels are Mosaic programs — on GPU (or any
    # other backend) they would fail to lower, while the jnp path is
    # parity-tested and compiles everywhere.
    return jax.default_backend() == "tpu"


def analyze_image_auto(
    img: jax.Array,
    kinds: Tuple[str, ...] = tuple(k.value for k in ALL_INDICES),
    with_renders: bool = True,
    with_hist: bool = True,
) -> AnalyzeResult:
    """analyze_image with automatic implementation choice.

    ``with_hist=False`` -> IndexStats.histogram is None (the
    reference's analyze_index stat set; see kernels/pipeline.py).
    """
    if use_kernels():
        from rgnir_tpu.kernels.pipeline import analyze_image_kernel

        return analyze_image_kernel(
            img, kinds=kinds, with_renders=with_renders,
            with_hist=with_hist,
        )
    return analyze_image_jit(
        img, kinds=kinds, with_renders=with_renders, with_hist=with_hist
    )

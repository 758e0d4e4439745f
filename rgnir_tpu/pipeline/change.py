"""Change detection between two dates (reference: process-images.py:885-989).

Flow parity: white-balanced early/late images -> phase-correlation
alignment of late onto early (process-images.py:905-908) -> per-image
index maps -> ``diff = late - early`` (921-925) -> 3-panel figure
(early/late with the index colormap at +/-1, difference with bwr at
+/-0.5; 940-959).

TPU-native: alignment (FFT phase correlation + bilinear warp), both
index maps, the difference, and its stats all run in one jit on device;
only the figure composition is host-side.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from rgnir_tpu.config import IndexKind, MAX_ALIGN_DIM
from rgnir_tpu.ops.indices import compute_index
from rgnir_tpu.ops.resize import preprocess_large_image
from rgnir_tpu.register import align_images, align_images_local
from rgnir_tpu.viz.figures import render_change_figure


@functools.partial(
    jax.jit, static_argnames=("kind", "upsample_factor", "refine_tile")
)
def change_maps(
    early_wb: jax.Array,
    late_wb: jax.Array,
    kind: Union[IndexKind, str],
    upsample_factor: int = 1,
    refine_tile: Optional[int] = None,
):
    """(early_index, late_index, diff, shift) — fully on device.

    Inputs are white-balanced HWC uint8 images of the same shape (the
    caller downscales to the alignment cap first). ``upsample_factor``
    > 1 enables subpixel registration (upsampled-DFT refinement, a
    capability beyond the reference's integer-pixel alignment).
    ``refine_tile`` enables non-rigid alignment: per-tile residual
    shifts on refine_tile x refine_tile tiles, interpolated into a
    smooth warp field (register.local) — for mosaics whose drift a
    single translation cannot express.
    """
    kind = IndexKind.parse(kind)
    if refine_tile is not None:
        aligned_late, shift, _ = align_images_local(
            early_wb, late_wb, tile=(refine_tile, refine_tile),
            upsample_factor=upsample_factor,
        )
    else:
        aligned_late, shift = align_images(
            early_wb, late_wb, upsample_factor=upsample_factor
        )
    early_index = compute_index(early_wb, kind)
    # The aligned image is float32 (resampled); the reference computes
    # the index on it directly (process-images.py:916-919).
    late_index = compute_index(aligned_late, kind)
    diff = late_index - early_index
    return early_index, late_index, diff, shift


@functools.partial(jax.jit, static_argnames=("kind", "upsample_factor"))
def change_series_maps(
    stack_wb: jax.Array,
    kind: Union[IndexKind, str],
    upsample_factor: int = 1,
):
    """Consecutive-pair change maps over a whole time series, batched.

    The reference's monitoring flow differences only first vs last
    (process-images.py:1159); localizing WHEN a change happened needs
    every consecutive pair. On TPU that is one vmapped pass: for a
    ``(T, H, W, 3)`` white-balanced stack, all ``T-1`` alignments (FFT
    phase correlation + bilinear warp), index maps, and differences
    compute in a single jit — the batch dimension rides the hardware
    instead of a Python loop (compare process-images.py:885-989 called
    per pair).

    Returns ``(diffs (T-1, H, W), shifts (T-1, 2), stats)`` where stats
    is ``{"mean", "std", "min", "max"}`` per pair.
    """
    kind = IndexKind.parse(kind)

    def pair(early, late):
        _, _, diff, shift = change_maps(
            early, late, kind, upsample_factor=upsample_factor
        )
        return diff, shift

    diffs, shifts = jax.vmap(pair)(stack_wb[:-1], stack_wb[1:])
    stats = {
        "mean": jnp.mean(diffs, axis=(1, 2)),
        "std": jnp.std(diffs, axis=(1, 2)),
        "min": jnp.min(diffs, axis=(1, 2)),
        "max": jnp.max(diffs, axis=(1, 2)),
    }
    return diffs, shifts, stats


def change_detection(
    early_wb: np.ndarray,
    late_wb: np.ndarray,
    kind: Union[IndexKind, str],
    early_label: str = "",
    late_label: str = "",
    max_dim: int = MAX_ALIGN_DIM,
    with_figure: bool = True,
    upsample_factor: int = 1,
    refine_tile: Optional[int] = None,
) -> dict:
    """Full change-detection result.

    Returns {"early_index", "late_index", "diff", "shift", "figure"}.
    Labels render as the reference's ``Early: %Y-%m-%d`` titles
    (process-images.py:943, 950) when given. ``upsample_factor`` > 1
    registers to 1/upsample_factor pixel before differencing;
    ``refine_tile`` adds tiled non-rigid refinement (see
    :func:`change_maps`).
    """
    kind = IndexKind.parse(kind)
    early = preprocess_large_image(jnp.asarray(early_wb), max_dim)
    late = preprocess_large_image(jnp.asarray(late_wb), max_dim)
    if early.shape != late.shape:
        raise ValueError(
            f"early/late shapes differ after downscale: "
            f"{early.shape} vs {late.shape}"
        )
    early_index, late_index, diff, shift = change_maps(
        early, late, kind, upsample_factor=upsample_factor,
        refine_tile=refine_tile,
    )
    result = {
        "early_index": np.asarray(early_index),
        "late_index": np.asarray(late_index),
        "diff": np.asarray(diff),
        "shift": np.asarray(shift),
        "figure": None,
    }
    if with_figure:
        result["figure"] = render_change_figure(
            result["early_index"], result["late_index"], result["diff"],
            kind, early_label, late_label,
        )
    return result

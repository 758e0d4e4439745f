"""ZIP export of processed outputs (reference: process-images.py:567-617).

Archive layout parity: ``white_balanced.png`` + one
``{INDEX}_visualization.png`` per selected index (DEFLATE compression).
The reference re-computes each index and renders a matplotlib figure
per entry; here the fused device pass produces everything in one shot
and only PNG encoding happens per entry (in-memory).
"""

from __future__ import annotations

import io
import zipfile
from typing import Sequence, Union

import numpy as np

import jax.numpy as jnp

from rgnir_tpu.config import ALL_INDICES, IndexKind
from rgnir_tpu.io.writer import encode_png
from rgnir_tpu.pipeline.fused import analyze_image
from rgnir_tpu.viz.figures import render_index_figure


def export_processed_zip(
    corrected_array: np.ndarray,
    selected_indices: Sequence[Union[IndexKind, str]] = ALL_INDICES,
    figures: bool = True,
) -> bytes:
    """ZIP bytes with the white-balanced image and per-index renders.

    ``corrected_array``: HWC uint8 white-balanced image (the caller's
    pipeline already produced it, as in process-images.py:567).
    ``figures=True`` writes the reference's colorbar figure; otherwise
    full-resolution device colormap PNGs.
    """
    kinds = tuple(IndexKind.parse(k) for k in selected_indices)
    res = analyze_image(
        jnp.asarray(corrected_array),
        kinds=kinds,
        with_wb=False,            # input is already corrected
        with_renders=not figures,
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("white_balanced.png", encode_png(corrected_array))
        for kind in kinds:
            if figures:
                img = render_index_figure(
                    np.asarray(res.indices[kind.value]), kind
                )
                entry = io.BytesIO()
                img.save(entry, format="PNG")
                data = entry.getvalue()
            else:
                data = encode_png(np.asarray(res.renders[kind.value]))
            zf.writestr(f"{kind.value}_visualization.png", data)
    return buf.getvalue()

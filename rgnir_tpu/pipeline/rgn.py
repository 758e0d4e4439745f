"""Standalone white-balance correction flow (reference: process-rgn.py).

Parity surface:
- ``correct_file``  <- ``fix_white_balance_rgnir(image_path, output_path)``
  (process-rgn.py:4-49): load an RGNir image, per-channel p2/p98 stretch
  (the clip-before-rescale variant at process-rgn.py:27-33 is
  numerically identical to the app's clip-after, SURVEY.md 2.5), save
  and/or return the corrected image.
- ``visualize_correction_file`` <- ``visualize_correction``
  (process-rgn.py:51-68): original and corrected pasted side by side
  into a double-width canvas.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple, Union

import numpy as np
from PIL import Image

import jax.numpy as jnp

from rgnir_tpu.io.decode import decode_file
from rgnir_tpu.ops.wb import white_balance
from rgnir_tpu.viz.figures import side_by_side_canvas


def _correct(img: np.ndarray, method: str) -> np.ndarray:
    if method == "gray_world":
        from rgnir_tpu.ops.wb import gray_world_balance

        return np.asarray(gray_world_balance(jnp.asarray(img)))
    if method == "percentile":
        return np.asarray(white_balance(jnp.asarray(img)))
    raise ValueError(f"unknown WB method {method!r}")


def correct_file(
    image_path: Union[str, Path],
    output_path: Optional[Union[str, Path]] = None,
    method: str = "percentile",
) -> np.ndarray:
    """White-balance one file; optionally save. Returns the HWC uint8
    corrected array (the reference returns a PIL image when not saving;
    wrap with PIL.Image.fromarray if needed). ``method``: "percentile"
    (reference parity) or "gray_world"."""
    img = decode_file(image_path)
    corrected = _correct(img, method)
    if output_path is not None:
        out = Path(output_path)
        out.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(corrected).save(out)
    return corrected


def visualize_correction_file(
    image_path: Union[str, Path],
    output_path: Optional[Union[str, Path]] = None,
    method: str = "percentile",
) -> Image.Image:
    """Side-by-side original vs corrected canvas (process-rgn.py:51-68)."""
    img = decode_file(image_path)
    corrected = _correct(img, method)
    canvas = side_by_side_canvas(
        Image.fromarray(img), Image.fromarray(corrected)
    )
    if output_path is not None:
        out = Path(output_path)
        out.parent.mkdir(parents=True, exist_ok=True)
        canvas.save(out)
    return canvas

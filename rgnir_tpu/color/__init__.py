"""Colormap LUTs (baked from matplotlib at build time, device-resident).

``get_lut(name)`` returns the (256, 4) uint8 RGBA byte LUT matching
``ScalarMappable.to_rgba(..., bytes=True)`` for that colormap. If the
baked module is missing and matplotlib is available, LUTs are baked
on the fly.
"""

from __future__ import annotations

import numpy as np

try:
    from rgnir_tpu.color._generated_luts import LUTS  # type: ignore
except ImportError:  # pragma: no cover - build-time fallback
    import matplotlib

    LUTS = {}
    for _name in ("RdYlGn", "RdYlBu", "bwr", "gray", "viridis"):
        _cmap = matplotlib.colormaps[_name]
        _cmap._init()
        LUTS[_name] = (_cmap._lut[:256] * 255).astype(np.uint8)


def get_lut(name: str) -> np.ndarray:
    """(256, 4) uint8 RGBA LUT for a supported colormap name."""
    try:
        return LUTS[name]
    except KeyError:
        raise ValueError(
            f"Unsupported colormap {name!r}; baked: {sorted(LUTS)}"
        ) from None


__all__ = ["get_lut", "LUTS"]

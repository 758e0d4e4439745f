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
    """(256, 4) uint8 RGBA LUT for a colormap name.

    Names outside the build-time baked set (custom indices may name any
    matplotlib colormap) are baked on first use with the same recipe as
    ``color/_bake.py`` and cached for the process.
    """
    try:
        return LUTS[name]
    except KeyError:
        pass
    try:
        import matplotlib

        cmap = matplotlib.colormaps[name]
    except Exception:
        raise ValueError(
            f"Unsupported colormap {name!r}; baked: {sorted(LUTS)} "
            f"(matplotlib unavailable or has no such colormap)"
        ) from None
    if cmap.N != 256:
        # The device render's 16x16 hi/lo LUT decomposition needs 256
        # entries; parity for such maps is against the resampled map.
        cmap = cmap.resampled(256)
    cmap._init()
    # Same truncation recipe as _bake.py (matches to_rgba(bytes=True)).
    lut = (np.asarray(cmap._lut[:256]) * 255).astype(np.uint8)
    LUTS[name] = lut
    return lut


__all__ = ["get_lut", "LUTS"]

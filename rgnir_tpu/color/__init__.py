"""Colormap LUTs (baked from matplotlib at build time, device-resident).

``get_lut(name)`` returns the (256, 4) uint8 RGBA byte LUT matching
``ScalarMappable.to_rgba(..., bytes=True)`` for that colormap. If the
baked module is missing and matplotlib is available, LUTs are baked
on the fly.
"""

from __future__ import annotations

import threading

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

# Runtime-baked LUTs (custom-index colormaps outside the build-time
# set) live in their own dict so the generated module's LUTS is never
# mutated, and bakes are serialized — Streamlit reruns are
# multi-threaded and two threads may request the same new name at once.
_RUNTIME_LUTS: dict = {}
_BAKE_LOCK = threading.Lock()


def _bake_lut(name: str) -> np.ndarray:
    """Bake a (256, 4) uint8 LUT for ``name`` and VERIFY it against the
    public ``to_rgba(bytes=True)`` API.

    The bake itself uses matplotlib's private ``_lut`` (fast, and the
    exact recipe of ``color/_bake.py``), but private API can drift
    across matplotlib versions — the parity check below makes such a
    drift fail loudly here instead of silently changing custom-index
    renders while the baked builtins stay fixed.
    """
    import matplotlib
    from matplotlib import cm, colors

    cmap = matplotlib.colormaps[name]
    if cmap.N != 256:
        # The device render's 16x16 hi/lo LUT decomposition needs 256
        # entries; parity for such maps is against the resampled map.
        cmap = cmap.resampled(256)
    cmap._init()
    # Same truncation recipe as _bake.py (matches to_rgba(bytes=True)).
    lut = (np.asarray(cmap._lut[:256]) * 255).astype(np.uint8)
    # Parity oracle: values mapping exactly onto each of the 256 LUT
    # entries, rendered through the public API.
    sm = cm.ScalarMappable(norm=colors.Normalize(0.0, 1.0), cmap=cmap)
    ref = sm.to_rgba((np.arange(256, dtype=np.float64) + 0.5) / 256,
                     bytes=True)
    if not np.array_equal(lut, np.asarray(ref, np.uint8)):
        raise RuntimeError(
            f"Baked LUT for colormap {name!r} disagrees with "
            f"to_rgba(bytes=True) — matplotlib private-API drift; "
            f"re-bake color/_generated_luts.py against this version"
        )
    return lut


def get_lut(name: str) -> np.ndarray:
    """(256, 4) uint8 RGBA LUT for a colormap name.

    Names outside the build-time baked set (custom indices may name any
    matplotlib colormap) are baked on first use with the same recipe as
    ``color/_bake.py``, verified against ``to_rgba(bytes=True)``, and
    cached for the process.
    """
    try:
        return LUTS[name]
    except KeyError:
        pass
    try:
        return _RUNTIME_LUTS[name]
    except KeyError:
        pass
    with _BAKE_LOCK:
        if name in _RUNTIME_LUTS:  # lost the race: another thread baked it
            return _RUNTIME_LUTS[name]
        try:
            lut = _bake_lut(name)
        except (ImportError, KeyError):
            raise ValueError(
                f"Unsupported colormap {name!r}; baked: {sorted(LUTS)} "
                f"(matplotlib unavailable or has no such colormap)"
            ) from None
        _RUNTIME_LUTS[name] = lut
    return lut


__all__ = ["get_lut", "LUTS"]

"""NumPy golden implementations of the reference semantics.

These re-state the reference's math contracts (SURVEY.md section 2.6) as
plain NumPy, cited to /root/reference file:line, and serve as the
oracle for every device op. ``*_f32`` variants pin all arithmetic to
float32 (the documented parity target — the reference mixes float32
arrays with float64 percentile scalars, which NEP-50 promotes to
float64; see golden_white_balance for both).
"""

import numpy as np

EPS = 1e-10  # process-images.py:464


def golden_white_balance(img_u8: np.ndarray) -> np.ndarray:
    """fix_white_balance semantics (process-images.py:424-447).

    float32 image, per-channel p2/p98 percentile stretch, clip to
    [0, 255], truncate to uint8. Precision detail: the reference's
    tuple-q ``np.percentile(channel, (2, 98))`` returns float64, so the
    rescale promotes to float64, gets rounded to float32 by assignment
    into the preallocated ``corrected`` array, then truncates to uint8.
    This function uses numpy directly, so it IS the exact reference
    arithmetic; the device path computes the lerp and rescale in
    float32 (<=1 ulp each), flipping the uint8 floor on <0.2%% of
    pixels by +/-1.
    """
    img_float = img_u8.astype(np.float32)
    corrected = np.zeros_like(img_float)
    for i in range(3):
        channel = img_float[:, :, i]
        p2, p98 = np.percentile(channel, (2, 98))
        corrected[:, :, i] = np.clip((channel - p2) / (p98 - p2) * 255, 0, 255)
    return corrected.astype(np.uint8)


# Alias kept for clarity at call sites: the reference path is already
# all-float32 (see golden_white_balance docstring).
golden_white_balance_f32 = golden_white_balance


def golden_index(img: np.ndarray, index_type: str) -> np.ndarray:
    """calculate_index semantics (process-images.py:449-490), float32."""
    img_float = img.astype(np.float32)
    red = img_float[..., 0]
    green = img_float[..., 1]
    nir = img_float[..., 2]
    if index_type == "NDVI":
        index = (nir - red) / (nir + red + np.float32(EPS))
    elif index_type == "GNDVI":
        index = (nir - green) / (nir + green + np.float32(EPS))
    elif index_type == "NDWI":
        index = (green - nir) / (green + nir + np.float32(EPS))
    else:
        raise ValueError(f"Unknown index type: {index_type}")
    return np.clip(index, -1, 1)


def golden_analyze_index(index_array: np.ndarray, index_type: str) -> dict:
    """analyze_index semantics (process-images.py:492-513)."""
    threshold = 0.0 if index_type == "NDWI" else 0.2
    feature = "Water" if index_type == "NDWI" else "Vegetation"
    return {
        f"Mean {index_type}": float(np.mean(index_array)),
        f"Median {index_type}": float(np.median(index_array)),
        f"Min {index_type}": float(np.min(index_array)),
        f"Max {index_type}": float(np.max(index_array)),
        f"{feature} Coverage (%)": float(np.mean(index_array > threshold) * 100),
    }


def golden_ndvi_statistics(ndvi: np.ndarray) -> dict:
    """analyze_ndvi_statistics semantics (process-ndvi.py:50-73)."""
    return {
        "mean_ndvi": float(np.mean(ndvi)),
        "median_ndvi": float(np.median(ndvi)),
        "min_ndvi": float(np.min(ndvi)),
        "max_ndvi": float(np.max(ndvi)),
        "std_ndvi": float(np.std(ndvi)),
        "vegetation_coverage": float(np.sum(ndvi > 0.2) / ndvi.size * 100),
    }


def golden_histogram(values: np.ndarray, bins: int = 50) -> np.ndarray:
    """plt.hist(..., bins=50, range=(-1, 1)) counts (process-ndvi.py:97)."""
    counts, _ = np.histogram(values.ravel(), bins=bins, range=(-1, 1))
    return counts


def golden_colormap_rgba(values: np.ndarray, cmap_name: str,
                         vmin: float = -1.0, vmax: float = 1.0) -> np.ndarray:
    """imshow colormap mapping as bytes (process-images.py:690-697)."""
    import matplotlib
    import matplotlib.cm as cm
    from matplotlib import colors

    sm = cm.ScalarMappable(
        norm=colors.Normalize(vmin, vmax), cmap=matplotlib.colormaps[cmap_name]
    )
    return sm.to_rgba(values, bytes=True)

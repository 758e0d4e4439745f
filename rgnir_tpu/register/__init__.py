"""L1 registration: phase-correlation alignment, TPU-native.

Reference: ``align_images`` (process-images.py:515-565) — grayscale via
skimage ``rgb2gray``, shift estimate via ``phase_cross_correlation``,
resample via ``scipy.ndimage.shift(order=1, mode='reflect')``. Rebuilt
here as jit-compiled JAX: 2-D FFT cross-power spectrum on device,
wrap-aware argmax, and a bilinear reflect-mode warp — no SciPy/skimage
on the compute path.
"""

from rgnir_tpu.register.phase import (
    luminance,
    phase_correlation_shift,
    align_images,
)
from rgnir_tpu.register.warp import shift_image, bilinear_shift_2d
from rgnir_tpu.register.local import (
    align_images_local,
    local_shift_field,
    warp_with_field,
)

__all__ = [
    "luminance",
    "phase_correlation_shift",
    "align_images",
    "align_images_local",
    "local_shift_field",
    "warp_with_field",
    "shift_image",
    "bilinear_shift_2d",
]

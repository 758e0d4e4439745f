"""Configuration for rgnir_tpu.

Every magic number in the reference becomes a named default here
(reference citations inline). Reference config surface: env vars
(process-images.py:21,29-32), edit-the-source constants
(backend-process.py:7-15), and inline literals (SURVEY.md section 5).
"""

from __future__ import annotations

import dataclasses
import enum
import re
from typing import Dict, Optional, Tuple, Union


class IndexKind(str, enum.Enum):
    """Normalized-difference indices supported by the reference.

    Band layout contract: channel 0 = Red, 1 = Green, 2 = NIR
    (reference: process-images.py:459-461, process-ndvi.py:21-22).
    """

    NDVI = "NDVI"    # (NIR - R) / (NIR + R + eps)   process-images.py:466-470
    GNDVI = "GNDVI"  # (NIR - G) / (NIR + G + eps)   process-images.py:472-476
    NDWI = "NDWI"    # (G - NIR) / (G + NIR + eps)   process-images.py:478-482

    @classmethod
    def parse(cls, value: "IndexLike | str") -> "IndexLike":
        """Resolve an index spec: builtin enum member, registered
        :class:`CustomIndex` name (see :func:`register_index`), or an
        already-resolved kind object (returned as-is)."""
        if isinstance(value, (IndexKind, CustomIndex)):
            return value
        key = str(value).upper()
        try:
            return cls(key)
        except ValueError:
            custom = _CUSTOM_INDICES.get(key)
            if custom is not None:
                return custom
            raise ValueError(f"Unknown index type: {value}") from None

    @property
    def feature_name(self) -> str:
        # process-images.py:498-504
        return "Water" if self is IndexKind.NDWI else "Vegetation"

    @property
    def coverage_threshold(self) -> float:
        # vegetation 0.2, water 0.0 (process-images.py:498-503)
        return 0.0 if self is IndexKind.NDWI else 0.2

    @property
    def cmap_name(self) -> str:
        # RdYlBu for NDWI else RdYlGn (process-images.py:690-693)
        return "RdYlBu" if self is IndexKind.NDWI else "RdYlGn"


ALL_INDICES: Tuple[IndexKind, ...] = (IndexKind.NDVI, IndexKind.GNDVI, IndexKind.NDWI)


@dataclasses.dataclass(frozen=True)
class CustomIndex:
    """A user-defined normalized-difference index — beyond the
    reference's fixed three (process-images.py:466-485 hardcodes the
    dispatch; this framework makes the family open).

    ``index = clip((bands[0] - bands[1]) / (bands[0] + bands[1] + eps), -1, 1)``

    with the same eps/clip contract as the builtins (SURVEY.md
    section 2.6). A registered custom index flows through EVERY path a
    builtin does — the jnp ops, the fused Pallas kernel (including the
    antipodal-derivation optimization when its band pair is the swap of
    another requested kind's), the sharded mosaic bodies, renders, and
    figures — because all of them read only ``bands`` /
    ``coverage_threshold`` / ``cmap_name`` / ``feature_name`` /
    ``value``.

    Instances are frozen and hashable: they are legal static jit
    arguments and can be passed anywhere an ``IndexKind`` is accepted.
    """

    name: str
    bands: Tuple[int, int]          # (positive, negative) channel index
    coverage_threshold: float = 0.2
    cmap_name: str = "RdYlGn"
    feature_name: str = "Vegetation"

    @property
    def value(self) -> str:
        # Mirrors IndexKind.value (dict keys, filenames, labels).
        return self.name


# Registry of CustomIndex by UPPER-CASED name. Append-only per process:
# pipeline entry points take index NAMES as static jit arguments, so
# redefining a name would silently hit the stale jit cache compiled for
# the old definition — register_index therefore refuses to rebind a
# name to a different spec (idempotent re-registration is fine).
_CUSTOM_INDICES: Dict[str, "CustomIndex"] = {}

# Custom index names double as output path components and jit cache
# keys; keep them to a conservative filesystem-safe alphabet.
_INDEX_NAME_RE = re.compile(r"[A-Za-z0-9_-]+")


def register_index(
    name: str,
    bands: Tuple[int, int],
    *,
    coverage_threshold: float = 0.2,
    cmap_name: str = "RdYlGn",
    feature_name: str = "Vegetation",
) -> "CustomIndex":
    """Register a custom normalized-difference index under ``name``.

    ``bands`` is the (positive, negative) channel pair in the RGNir
    layout (0=Red, 1=Green, 2=NIR) — e.g. ``("NDVI-like", (2, 0))``.
    After registration the name is accepted everywhere an index type
    string is (analyze pipelines, CLI, mosaics, renders). Returns the
    resolved :class:`CustomIndex`.

    Raises ``ValueError`` on a builtin-name collision, malformed bands,
    or an attempt to rebind an existing name to a DIFFERENT spec (index
    names are static jit cache keys — see ``_CUSTOM_INDICES``).
    """
    key = str(name).upper()
    if key in IndexKind.__members__:
        raise ValueError(
            f"Index name {name!r} collides with builtin IndexKind.{key}"
        )
    # The name becomes an output SUBDIRECTORY in the batch pipeline
    # ({out}/{NAME}/...), so it must be a safe path component: no
    # separators, no '.'/'..', no whitespace-only or control chars.
    if not _INDEX_NAME_RE.fullmatch(key):
        raise ValueError(
            f"Bad index name {name!r}: must match [A-Za-z0-9_-]+ "
            f"(it is used as an output path component)"
        )
    ia, ib = int(bands[0]), int(bands[1])
    if not (0 <= ia <= 2 and 0 <= ib <= 2) or ia == ib:
        raise ValueError(
            f"bands must be two DISTINCT channels in 0..2, got {bands!r}"
        )
    idx = CustomIndex(
        name=str(name),
        bands=(ia, ib),
        coverage_threshold=float(coverage_threshold),
        cmap_name=str(cmap_name),
        feature_name=str(feature_name),
    )
    existing = _CUSTOM_INDICES.get(key)
    if existing is not None:
        if existing == idx:
            return existing
        raise ValueError(
            f"Index {name!r} is already registered with a different "
            f"spec ({existing}); names are static jit cache keys and "
            f"cannot be rebound — pick a new name"
        )
    _CUSTOM_INDICES[key] = idx
    return idx


def registered_indices() -> Tuple["CustomIndex", ...]:
    """All custom indices registered in this process."""
    return tuple(_CUSTOM_INDICES.values())


# Anything accepted where an index kind is expected.
IndexLike = Union[IndexKind, CustomIndex]

# Numerical contract constants (SURVEY.md section 2.6)
EPSILON: float = 1e-10          # process-images.py:464
INDEX_CLIP: Tuple[float, float] = (-1.0, 1.0)  # process-images.py:490
HIST_BINS: int = 50             # process-ndvi.py:97 (50 bins over (-1, 1))

# Size caps (all LANCZOS in the reference)
MAX_STORE_DIM: int = 2048       # process-images.py:231
MAX_ANALYSIS_DIM: int = 1024    # process-images.py:398
MAX_ALIGN_DIM: int = 1024       # process-images.py:531
THUMBNAIL_SIZE: Tuple[int, int] = (400, 400)  # process-images.py:188
MAX_DOC_MB: float = 16.0        # Mongo doc limit precheck, process-images.py:204-209


@dataclasses.dataclass(frozen=True)
class WBConfig:
    """White-balance percentile stretch (process-images.py:424-447).

    ``corrected = clip((ch - p_low_val) / (p_high_val - p_low_val) * 255, 0, 255)``
    per channel, with percentiles (2, 98) by default (process-images.py:437).
    """

    p_low: float = 2.0
    p_high: float = 98.0
    out_scale: float = 255.0


@dataclasses.dataclass(frozen=True)
class IndexConfig:
    """Index math contract (process-images.py:449-513)."""

    eps: float = EPSILON
    clip_lo: float = INDEX_CLIP[0]
    clip_hi: float = INDEX_CLIP[1]
    vegetation_threshold: float = 0.2  # process-images.py:498
    water_threshold: float = 0.0       # process-images.py:502
    hist_bins: int = HIST_BINS


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Colormap render contract (process-images.py:690-697).

    vmin/vmax are the imshow limits; change maps use bwr with +/-0.5
    (process-images.py:954-959).
    """

    vmin: float = -1.0
    vmax: float = 1.0
    change_cmap: str = "bwr"
    change_vlim: float = 0.5
    dpi: int = 100  # process-images.py:676


@dataclasses.dataclass(frozen=True)
class TileConfig:
    """Spatial tiling for mosaics sharded over a device mesh."""

    tile_h: int = 512
    tile_w: int = 512
    # Pallas kernel block (VPU-aligned: last dim 128, f32 sublane 8)
    block_h: int = 256
    block_w: int = 256


@dataclasses.dataclass(frozen=True)
class LoaderConfig:
    """Async host-side decode/encode pools (SURVEY.md section 7, io/)."""

    decode_workers: int = 8
    encode_workers: int = 4
    prefetch_batches: int = 2
    batch_size: int = 32
    # Probe headers first, then decode whole same-shape batches straight
    # into one contiguous arena with the native C++ pool (no per-image
    # stack copy). Falls back to the streaming PIL path per file when
    # the native decoder is absent or rejects a file.
    arena_decode: bool = True
    # When set, decoded arrays are cached as raw .npy blobs here and
    # re-reads skip the image decode entirely (io/cache.py).
    decode_cache_dir: Optional[str] = None
    decode_cache_max_bytes: int = 2 << 30


@dataclasses.dataclass(frozen=True)
class StoreConfig:
    """Storage backend knobs (process-images.py:24-57)."""

    mongo_uri: Optional[str] = None    # MONGODB_URI env (process-images.py:29-32)
    max_pool_size: int = 3             # process-images.py:42
    max_idle_time_ms: int = 30000      # process-images.py:42
    server_selection_timeout_ms: int = 5000   # process-images.py:46
    connect_timeout_ms: int = 10000           # process-images.py:47
    socket_timeout_ms: int = 30000            # process-images.py:48
    max_doc_mb: float = MAX_DOC_MB
    max_store_dim: int = MAX_STORE_DIM
    images_per_page: int = 12          # process-images.py:1232

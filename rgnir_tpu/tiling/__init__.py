"""Spatial tiling for orthomosaics (SURVEY.md section 5 long-context entry).

The reference's only answer to large images is *downscaling* (caps at
2048/1024 px). Here a gigascale mosaic keeps full resolution: pad to a
tile multiple, reshape into a tile grid, shard the grid over the device
mesh, and mask padding out of every reduction.
"""

from rgnir_tpu.tiling.tiles import (
    pad_to_multiple,
    tile_image,
    untile_image,
    valid_mask,
)

__all__ = ["pad_to_multiple", "tile_image", "untile_image", "valid_mask"]

# forge3d_tpu/codec — native codecs (F3DZ DEM compression, BC textures).
#
# Parity notes (reference behavior, not code): /root/reference/src/codec/
# (COMPENDIUM) + python/forge3d/codec.py expose compress_dem /
# decompress_dem / verify_dem with a deterministic error-bounded format,
# and BC7/BC5 texture codecs live in src/core/compressed_textures*.

from .f3dz import (F3dzError, compress_dem, decompress_dem, f3dz_info,
                   verify_dem)
from .f3dz_device import decompress_dem_device

__all__ = ["compress_dem", "decompress_dem", "decompress_dem_device",
           "verify_dem", "f3dz_info", "F3dzError"]

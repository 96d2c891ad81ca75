# forge3d_tpu/geo — MENSURA: the pure-Python/numpy projection engine.
#
# Parity notes (reference behavior, not code): the reference implements its
# own projection engine rather than shelling to PROJ
# (/root/reference/src/geo/{projections/,geodesic.rs,reproject.rs},
# CHANGELOG 1.32.0): Transverse Mercator, Lambert Conformal Conic 2SP,
# Albers, Mercator/Web-Mercator, Polar Stereographic, geocentric ECEF,
# geodesics, plus helpers (estimate_local_utm, web_mercator_bounds,
# slippy_tile_index). Same scope here, numpy-vectorized.

from .crs import (  # noqa: F401
    CRS,
    Ellipsoid,
    GRS80,
    WGS84,
    Transformer,
    create_crs_transformer,
    ecef_to_geodetic,
    estimate_local_utm,
    geodetic_to_ecef,
    inspect_crs,
    parse_crs,
    slippy_tile_index,
    web_mercator_bounds,
)
from .geodesic import geodesic_direct, geodesic_inverse  # noqa: F401

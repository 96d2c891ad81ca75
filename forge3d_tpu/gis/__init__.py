# forge3d_tpu/gis — raster/vector GIS layer (host-side).
#
# Parity notes: mirrors the reference's gis function surface
# (/root/reference/python/forge3d/gis.py and src/gis/, SURVEY A.7 "GIS
# raster" group): windowed reads, info, normalize/classify/mask, nodata,
# transform/bounds helpers.

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..errors import TransformFailed, UploadError
from .geotiff import RasterInfo, raster_info, read_raster, write_raster  # noqa: F401


def read_raster_info(path) -> dict:
    info = raster_info(path)
    return {
        "width": info.width, "height": info.height, "count": info.count,
        "dtype": info.dtype, "nodata": info.nodata,
        "transform": info.transform, "crs": info.crs,
        "bounds": info.bounds, "resolution": info.resolution,
        "tiled": info.tiled, "block_size": info.block_size,
    }


def read_raster_window(path, window: Tuple[int, int, int, int],
                       band: Optional[int] = None) -> np.ndarray:
    return read_raster(path, window=window, band=band)


def read_raster_mask(path, window=None) -> np.ndarray:
    """Valid-data mask (True where data is valid, i.e. != nodata)."""
    info = raster_info(path)
    data = read_raster(path, window=window)
    if info.nodata is None:
        return np.ones(data.shape[:2], bool)
    band0 = data if data.ndim == 2 else data[..., 0]
    if np.isnan(info.nodata):
        return ~np.isnan(band0)
    return band0 != info.nodata


def raster_bounds(path) -> Tuple[float, float, float, float]:
    return raster_info(path).bounds


def raster_crs(path) -> Optional[str]:
    return raster_info(path).crs


def raster_resolution(path) -> Tuple[float, float]:
    return raster_info(path).resolution


def raster_transform(path) -> Tuple[float, ...]:
    return raster_info(path).transform


# -- transform helpers -----------------------------------------------------

def transform_from_origin(west: float, north: float, xsize: float, ysize: float):
    """Affine from upper-left origin + pixel sizes (rasterio convention)."""
    return (xsize, 0.0, west, 0.0, -abs(ysize), north)


def xy(transform, row, col, offset: str = "center"):
    """Pixel (row, col) -> world (x, y)."""
    a, b, c, d, e, f = transform
    dx = dy = 0.5 if offset == "center" else 0.0
    col = np.asarray(col, np.float64) + dx
    row = np.asarray(row, np.float64) + dy
    return (a * col + b * row + c, d * col + e * row + f)


def rowcol(transform, x, y):
    """World (x, y) -> pixel (row, col) by inverse affine."""
    a, b, c, d, e, f = transform
    det = a * e - b * d
    if abs(det) < 1e-15:
        raise TransformFailed("degenerate raster transform")
    x = np.asarray(x, np.float64) - c
    y = np.asarray(y, np.float64) - f
    col = (e * x - b * y) / det
    row = (-d * x + a * y) / det
    return (np.floor(row).astype(np.int64), np.floor(col).astype(np.int64))


def window_from_bounds(transform, bounds, width: int, height: int):
    """World bounds -> pixel window (col_off, row_off, w, h), clamped."""
    minx, miny, maxx, maxy = bounds
    a, b, c, d, e, f = transform
    det = a * e - b * d
    if abs(det) < 1e-15:
        raise TransformFailed("degenerate raster transform")

    def frac(xx, yy):
        xx, yy = xx - c, yy - f
        return ((-d * xx + a * yy) / det, (e * xx - b * yy) / det)  # row, col

    corners = [frac(minx, miny), frac(minx, maxy), frac(maxx, miny), frac(maxx, maxy)]
    rows = [p[0] for p in corners]
    cols = [p[1] for p in corners]
    import math as _math

    r0 = int(_math.floor(min(rows)))
    r1 = int(_math.ceil(max(rows)))
    c0 = int(_math.floor(min(cols)))
    c1 = int(_math.ceil(max(cols)))
    c0 = max(0, c0)
    r0 = max(0, r0)
    c1 = min(width, c1)
    r1 = min(height, r1)
    if c1 <= c0 or r1 <= r0:
        raise TransformFailed("bounds do not intersect raster")
    return (c0, r0, c1 - c0, r1 - r0)


# -- raster math -----------------------------------------------------------

def normalize_raster(data: np.ndarray, vmin=None, vmax=None,
                     nodata: Optional[float] = None) -> np.ndarray:
    """Scale to [0, 1]; nodata cells become NaN."""
    a = np.asarray(data, np.float64)
    mask = np.isfinite(a)
    if nodata is not None and not np.isnan(nodata):
        mask &= a != nodata
    if not mask.any():
        raise UploadError("raster has no valid data")
    lo = float(a[mask].min() if vmin is None else vmin)
    hi = float(a[mask].max() if vmax is None else vmax)
    span = hi - lo if hi > lo else 1.0
    out = (a - lo) / span
    out[~mask] = np.nan
    return np.clip(out, 0.0, 1.0, out=out).astype(np.float32)


def classify_raster(data: np.ndarray, breaks: Sequence[float]) -> np.ndarray:
    """Classify by thresholds; class i for value in (breaks[i-1], breaks[i]].
    Returns int32 classes 0..len(breaks)."""
    if not breaks or list(breaks) != sorted(breaks):
        raise ValueError("breaks must be a non-empty ascending sequence")
    a = np.asarray(data, np.float64)
    return np.searchsorted(np.asarray(breaks, np.float64), a, side="left").astype(np.int32)


def mask_raster(data: np.ndarray, mask: np.ndarray, fill=np.nan) -> np.ndarray:
    a = np.array(data, np.float32, copy=True)
    m = np.asarray(mask, bool)
    if m.shape != a.shape[:2]:
        raise UploadError("mask shape must match raster")
    a[~m] = fill
    return a


def apply_nodata(data: np.ndarray, nodata: float) -> np.ndarray:
    """Replace nodata values with NaN (float output)."""
    a = np.asarray(data, np.float32).copy()
    if np.isnan(nodata):
        return a
    a[a == nodata] = np.nan
    return a


def resample_raster(data: np.ndarray, out_shape: Tuple[int, int],
                    method: str = "bilinear") -> np.ndarray:
    """Resample a 2D raster to out_shape (bilinear or nearest)."""
    a = np.asarray(data, np.float64)
    if a.ndim != 2:
        raise UploadError("resample_raster expects a 2D band")
    oh, ow = out_shape
    if oh < 1 or ow < 1:
        raise ValueError("out_shape must be positive")
    yi = np.linspace(0, a.shape[0] - 1, oh)
    xi = np.linspace(0, a.shape[1] - 1, ow)
    if method == "nearest":
        return a[np.round(yi).astype(int)[:, None],
                 np.round(xi).astype(int)[None, :]].astype(np.float32)
    if method != "bilinear":
        raise ValueError(f"unknown resample method {method!r}")
    y0 = np.floor(yi).astype(int)
    x0 = np.floor(xi).astype(int)
    y1 = np.minimum(y0 + 1, a.shape[0] - 1)
    x1 = np.minimum(x0 + 1, a.shape[1] - 1)
    fy = (yi - y0)[:, None]
    fx = (xi - x0)[None, :]
    out = (
        a[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
        + a[np.ix_(y0, x1)] * (1 - fy) * fx
        + a[np.ix_(y1, x0)] * fy * (1 - fx)
        + a[np.ix_(y1, x1)] * fy * fx
    )
    return out.astype(np.float32)


def rasterize_polygons(polygons, out_shape: Tuple[int, int], transform=None,
                       fill: int = 0, values: Optional[Sequence[int]] = None) -> np.ndarray:
    """Rasterize polygons (lists of (x, y) rings) into an int32 grid via
    even-odd scanline fill. With no transform, coordinates are pixel-space.

    Reference seam: rasterize_vectors_py (src/gis/rasterize.rs).
    """
    oh, ow = out_shape
    out = np.full((oh, ow), fill, np.int32)
    if transform is not None:
        a, b, c, d, e, f = transform
        det = a * e - b * d

        def to_px(pt):
            x, y = pt[0] - c, pt[1] - f
            return ((e * x - b * y) / det, (-d * x + a * y) / det)
    else:
        def to_px(pt):
            return (pt[0], pt[1])

    for pi, poly in enumerate(polygons):
        val = values[pi] if values is not None else 1
        ring = [to_px(p) for p in poly]
        if len(ring) < 3:
            continue
        xs = np.array([p[0] for p in ring])
        ys = np.array([p[1] for p in ring])
        y0 = max(0, int(np.floor(ys.min())))
        y1 = min(oh - 1, int(np.ceil(ys.max())))
        n = len(ring)
        for row in range(y0, y1 + 1):
            yc = row + 0.5
            xs_cross = []
            for i in range(n):
                x1p, y1p = ring[i]
                x2p, y2p = ring[(i + 1) % n]
                if (y1p <= yc < y2p) or (y2p <= yc < y1p):
                    t = (yc - y1p) / (y2p - y1p)
                    xs_cross.append(x1p + t * (x2p - x1p))
            xs_cross.sort()
            for j in range(0, len(xs_cross) - 1, 2):
                cx0 = max(0, int(np.ceil(xs_cross[j] - 0.5)))
                cx1 = min(ow - 1, int(np.floor(xs_cross[j + 1] - 0.5)))
                if cx1 >= cx0:
                    out[row, cx0:cx1 + 1] = val
    return out

# forge3d_tpu/gis/dem.py
# DEM preparation + gridded-dataset reading.
#
# Parity notes (reference behavior, not code): the reference registers
# prepare_dem_py (nodata fill, clip, resample, sanitize) and
# read_gridded_dataset_py (gridded raster ingestion beyond plain GeoTIFF)
# — SURVEY §A.7. Hole filling: iterative neighbor-mean diffusion (the
# standard DEM void-fill), deterministic.

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..errors import RenderError

__all__ = ["prepare_dem", "fill_nodata", "read_gridded_dataset"]


def fill_nodata(dem: np.ndarray, mask: Optional[np.ndarray] = None, *,
                max_iterations: int = 256) -> Tuple[np.ndarray, int]:
    """Fill nodata holes by iterative 4-neighbor mean diffusion.

    Returns (filled, iterations_used). Holes touching valid data converge
    in O(hole radius) iterations; an all-nodata input raises.
    """
    a = np.asarray(dem, np.float64).copy()
    hole = ~np.isfinite(a) if mask is None else np.asarray(mask, bool).copy()
    if hole.all():
        raise RenderError("DEM is entirely nodata")
    a[hole] = 0.0
    valid = (~hole).astype(np.float64)
    filled = a * valid
    it = 0
    while hole.any() and it < max_iterations:
        it += 1
        s = np.zeros_like(filled)
        w = np.zeros_like(valid)
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            s += np.roll(filled, (dy, dx), (0, 1))
            w += np.roll(valid, (dy, dx), (0, 1))
        # roll wrap-around suppressed at borders
        if True:
            s2 = np.zeros_like(filled)
            w2 = np.zeros_like(valid)
            s2[:, 1:] += filled[:, :-1]; w2[:, 1:] += valid[:, :-1]
            s2[:, :-1] += filled[:, 1:]; w2[:, :-1] += valid[:, 1:]
            s2[1:, :] += filled[:-1, :]; w2[1:, :] += valid[:-1, :]
            s2[:-1, :] += filled[1:, :]; w2[:-1, :] += valid[1:, :]
            s, w = s2, w2
        newly = hole & (w > 0)
        filled = np.where(newly, s / np.maximum(w, 1e-12), filled)
        valid = np.where(newly, 1.0, valid)
        hole = hole & ~newly
    if hole.any():
        raise RenderError("nodata holes did not close (disconnected region)")
    return filled.astype(np.float32), it


def prepare_dem(dem, *, nodata: Optional[float] = None,
                clip_range: Optional[Tuple[float, float]] = None,
                out_shape: Optional[Tuple[int, int]] = None,
                smooth_sigma: float = 0.0) -> dict:
    """Sanitize a DEM for rendering (reference seam: prepare_dem_py):
    nodata -> filled, optional value clip, optional resample + smoothing.
    Returns {heights, report}."""
    a = np.asarray(dem, np.float64).copy()
    report: dict = {"input_shape": list(a.shape)}
    if nodata is not None:
        a[a == nodata] = np.nan
    holes = int((~np.isfinite(a)).sum())
    report["nodata_cells"] = holes
    if holes:
        a, iters = fill_nodata(a)
        report["fill_iterations"] = iters
    if clip_range is not None:
        lo, hi = clip_range
        report["clipped_cells"] = int(((a < lo) | (a > hi)).sum())
        a = np.clip(a, lo, hi)
    if out_shape is not None and tuple(out_shape) != a.shape:
        from . import resample_raster

        a = resample_raster(a, tuple(out_shape))
        report["resampled_to"] = list(out_shape)
    if smooth_sigma > 0:
        # separable binomial smoothing approximating a gaussian
        n = max(1, int(round(smooth_sigma ** 2 * 3)))
        for _ in range(n):
            a = (a + 0.5 * (np.roll(a, 1, 0) + np.roll(a, -1, 0))) / 2.0
            a[0] = a[1]
            a[-1] = a[-2]
            a = (a + 0.5 * (np.roll(a, 1, 1) + np.roll(a, -1, 1))) / 2.0
            a[:, 0] = a[:, 1]
            a[:, -1] = a[:, -2]
        report["smoothed"] = True
    report["min"] = float(np.min(a))
    report["max"] = float(np.max(a))
    return {"heights": a.astype(np.float32), "report": report}


def read_gridded_dataset(path, *, variable: Optional[str] = None
                         ) -> Tuple[np.ndarray, dict]:
    """Read gridded data from .npy/.npz/.tif/terrarium .png (reference
    seam: read_gridded_dataset_py); returns (array, metadata)."""
    p = Path(str(path))
    ext = p.suffix.lower()
    if ext == ".npy":
        return np.load(p), {"format": "npy"}
    if ext == ".npz":
        z = np.load(p)
        keys = list(z.keys())
        var = variable or keys[0]
        if var not in keys:
            raise RenderError(f"variable {var!r} not in {keys}")
        return z[var], {"format": "npz", "variables": keys,
                        "variable": var}
    if ext in (".tif", ".tiff"):
        from .geotiff import raster_info, read_raster

        info = raster_info(p)
        return read_raster(p), {"format": "geotiff",
                                "crs": info.crs,
                                "transform": info.transform}
    if ext == ".png":
        from ..io.image import png_to_numpy
        from .osm import decode_terrarium_dem

        img = png_to_numpy(p)
        if img.ndim == 3 and img.shape[2] >= 3:
            return decode_terrarium_dem(img), {"format": "terrarium-png"}
        return img.astype(np.float32), {"format": "png-gray"}
    raise RenderError(f"unsupported gridded dataset format: {ext}")

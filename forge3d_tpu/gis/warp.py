# forge3d_tpu/gis/warp.py
# Raster warp/reproject through the MENSURA CRS engine, with per-pixel
# failure accounting.
#
# Parity notes (reference behavior, not code): /root/reference/src/gis/
# warp.rs reprojects rasters between CRSs with per-pixel failure counting
# and nodata handling; seams reproject_raster_py, align_raster_grid_py /
# align_raster_to_py. Inverse-mapping warp: for each destination pixel,
# transform its center to the source CRS and sample (nearest or bilinear).

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..errors import RenderError

__all__ = ["reproject_raster", "align_raster_to", "WarpError",
           "bounds_transform"]


class WarpError(RenderError):
    pass


def _affine_xy(transform, cols, rows):
    a, b, c, d, e, f = transform
    return (a * cols + b * rows + c, d * cols + e * rows + f)


def _affine_inv(transform):
    a, b, c, d, e, f = transform
    det = a * e - b * d
    if abs(det) < 1e-30:
        raise WarpError("singular raster transform")
    ia, ib = e / det, -b / det
    id_, ie = -d / det, a / det
    ic = -(ia * c + ib * f)
    if_ = -(id_ * c + ie * f)
    return (ia, ib, ic, id_, ie, if_)


def bounds_transform(src_shape, src_transform, transformer) -> Tuple:
    """Destination transform + shape covering the reprojected source
    bounds at comparable resolution."""
    h, w = src_shape
    edge = np.concatenate([
        np.stack([np.arange(w + 1), np.zeros(w + 1)], 1),
        np.stack([np.arange(w + 1), np.full(w + 1, h)], 1),
        np.stack([np.zeros(h + 1), np.arange(h + 1)], 1),
        np.stack([np.full(h + 1, w), np.arange(h + 1)], 1),
    ])
    sx, sy = _affine_xy(src_transform, edge[:, 0], edge[:, 1])
    dx, dy = transformer.transform(sx, sy)
    ok = np.isfinite(dx) & np.isfinite(dy)
    if not ok.any():
        raise WarpError("no source edge point reprojects")
    x0, x1 = float(np.min(dx[ok])), float(np.max(dx[ok]))
    y0, y1 = float(np.min(dy[ok])), float(np.max(dy[ok]))
    res = max((x1 - x0) / w, (y1 - y0) / h)
    out_w = max(1, int(np.ceil((x1 - x0) / res)))
    out_h = max(1, int(np.ceil((y1 - y0) / res)))
    dst_transform = (res, 0.0, x0, 0.0, -res, y1)
    return dst_transform, (out_h, out_w)


def reproject_raster(data: np.ndarray, src_transform, src_crs, dst_crs, *,
                     dst_transform=None, dst_shape=None,
                     resampling: str = "bilinear",
                     nodata: Optional[float] = None) -> Tuple[np.ndarray, Tuple, dict]:
    """Warp a raster between CRSs (reference seam: reproject_raster_py).

    Returns (warped, dst_transform, report); report counts per-pixel
    transform failures and out-of-source pixels, the reference's warp
    accounting contract.
    """
    from ..geo.crs import create_crs_transformer

    data = np.asarray(data)
    if data.ndim != 2:
        raise WarpError("reproject_raster expects a 2D band")
    h, w = data.shape
    fwd = create_crs_transformer(src_crs, dst_crs)
    if dst_transform is None or dst_shape is None:
        dst_transform, dst_shape = bounds_transform((h, w), src_transform, fwd)
    oh, ow = dst_shape
    inv = create_crs_transformer(dst_crs, src_crs)

    rows, cols = np.mgrid[0:oh, 0:ow].astype(np.float64)
    dxs, dys = _affine_xy(dst_transform, cols + 0.5, rows + 0.5)
    with np.errstate(all="ignore"):
        sxs, sys_ = inv.transform(dxs, dys)
    fail = ~(np.isfinite(sxs) & np.isfinite(sys_))

    ia = _affine_inv(src_transform)
    pc, pr = _affine_xy(ia, np.where(fail, 0.0, sxs),
                        np.where(fail, 0.0, sys_))
    pc = pc - 0.5
    pr = pr - 0.5
    inside = (~fail) & (pc >= -0.5) & (pc <= w - 0.5) \
        & (pr >= -0.5) & (pr <= h - 0.5)

    fill = nodata if nodata is not None else np.nan
    out = np.full((oh, ow), fill, np.float64)
    if resampling == "nearest":
        ci = np.clip(np.round(pc).astype(int), 0, w - 1)
        ri = np.clip(np.round(pr).astype(int), 0, h - 1)
        out[inside] = data[ri[inside], ci[inside]]
    elif resampling == "bilinear":
        c0 = np.clip(np.floor(pc).astype(int), 0, w - 1)
        r0 = np.clip(np.floor(pr).astype(int), 0, h - 1)
        c1 = np.minimum(c0 + 1, w - 1)
        r1 = np.minimum(r0 + 1, h - 1)
        fc = np.clip(pc - c0, 0, 1)
        fr = np.clip(pr - r0, 0, 1)
        val = (data[r0, c0] * (1 - fr) * (1 - fc)
               + data[r0, c1] * (1 - fr) * fc
               + data[r1, c0] * fr * (1 - fc)
               + data[r1, c1] * fr * fc)
        if nodata is not None:
            bad = ((data[r0, c0] == nodata) | (data[r0, c1] == nodata)
                   | (data[r1, c0] == nodata) | (data[r1, c1] == nodata))
            val = np.where(bad, nodata, val)
        out[inside] = val[inside]
    else:
        raise WarpError(f"unknown resampling {resampling!r}")

    report = {
        "transform_failures": int(fail.sum()),
        "outside_source": int((~inside & ~fail).sum()),
        "valid_pixels": int(inside.sum()),
        "total_pixels": int(oh * ow),
    }
    return out.astype(data.dtype if np.issubdtype(data.dtype, np.floating)
                      else np.float64), dst_transform, report


def align_raster_to(data: np.ndarray, src_transform,
                    ref_transform, ref_shape, *,
                    resampling: str = "bilinear",
                    nodata: Optional[float] = None) -> np.ndarray:
    """Resample a raster onto a reference grid in the SAME CRS
    (reference seam: align_raster_to_py / align_raster_grid_py)."""
    data = np.asarray(data, np.float64)
    h, w = data.shape
    oh, ow = ref_shape
    rows, cols = np.mgrid[0:oh, 0:ow].astype(np.float64)
    xs, ys = _affine_xy(ref_transform, cols + 0.5, rows + 0.5)
    ia = _affine_inv(src_transform)
    pc, pr = _affine_xy(ia, xs, ys)
    pc -= 0.5
    pr -= 0.5
    inside = (pc >= -0.5) & (pc <= w - 0.5) & (pr >= -0.5) & (pr <= h - 0.5)
    fill = nodata if nodata is not None else np.nan
    out = np.full((oh, ow), fill)
    if resampling == "nearest":
        ci = np.clip(np.round(pc).astype(int), 0, w - 1)
        ri = np.clip(np.round(pr).astype(int), 0, h - 1)
        out[inside] = data[ri[inside], ci[inside]]
    else:
        c0 = np.clip(np.floor(pc).astype(int), 0, w - 1)
        r0 = np.clip(np.floor(pr).astype(int), 0, h - 1)
        c1 = np.minimum(c0 + 1, w - 1)
        r1 = np.minimum(r0 + 1, h - 1)
        fc = np.clip(pc - c0, 0, 1)
        fr = np.clip(pr - r0, 0, 1)
        val = (data[r0, c0] * (1 - fr) * (1 - fc)
               + data[r0, c1] * (1 - fr) * fc
               + data[r1, c0] * fr * (1 - fc)
               + data[r1, c1] * fr * fc)
        out[inside] = val[inside]
    return out

# forge3d_tpu/transforms.py
# Matrix/grid helpers (reference parity: rotate_x/y/z, scale, translate,
# grid_generate, dem_stats — SURVEY A.7 camera/math group).

from __future__ import annotations

import math
from typing import Tuple

import numpy as np


def rotate_x(deg: float) -> np.ndarray:
    r = math.radians(deg)
    c, s = math.cos(r), math.sin(r)
    m = np.eye(4, dtype=np.float32)
    m[1, 1], m[1, 2] = c, -s
    m[2, 1], m[2, 2] = s, c
    return m


def rotate_y(deg: float) -> np.ndarray:
    r = math.radians(deg)
    c, s = math.cos(r), math.sin(r)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 2] = c, s
    m[2, 0], m[2, 2] = -s, c
    return m


def rotate_z(deg: float) -> np.ndarray:
    r = math.radians(deg)
    c, s = math.cos(r), math.sin(r)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 1] = c, -s
    m[1, 0], m[1, 1] = s, c
    return m


def scale(sx: float, sy: float = None, sz: float = None) -> np.ndarray:
    sy = sx if sy is None else sy
    sz = sx if sz is None else sz
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[1, 1], m[2, 2] = sx, sy, sz
    return m


def translate(tx: float, ty: float, tz: float) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = (tx, ty, tz)
    return m


def grid_generate(nx: int, nz: int, spacing: Tuple[float, float] = (1.0, 1.0),
                  origin: Tuple[float, float] = (0.0, 0.0)):
    """Generate a regular grid mesh in the XZ plane.

    Returns (positions (N,3) f32, uvs (N,2) f32, indices (M,3) u32) with
    CCW winding viewed from +Y.
    """
    if nx < 2 or nz < 2:
        raise ValueError("grid_generate requires nx, nz >= 2")
    xs = origin[0] + np.arange(nx, dtype=np.float32) * spacing[0]
    zs = origin[1] + np.arange(nz, dtype=np.float32) * spacing[1]
    gx, gz = np.meshgrid(xs, zs)
    pos = np.stack([gx, np.zeros_like(gx), gz], axis=-1).reshape(-1, 3)
    u, v = np.meshgrid(
        np.linspace(0, 1, nx, dtype=np.float32),
        np.linspace(0, 1, nz, dtype=np.float32),
    )
    uv = np.stack([u, v], axis=-1).reshape(-1, 2)
    idx = []
    for z in range(nz - 1):
        for x in range(nx - 1):
            a = z * nx + x
            b = a + 1
            c = a + nx
            d = c + 1
            idx.append([a, c, b])
            idx.append([b, c, d])
    return pos, uv, np.asarray(idx, np.uint32)


def dem_stats(heightmap: np.ndarray) -> dict:
    """Basic DEM statistics (reference: forge3d.dem_stats)."""
    hm = np.asarray(heightmap, np.float64)
    if hm.ndim != 2:
        raise ValueError("heightmap must be 2D")
    finite = hm[np.isfinite(hm)]
    if finite.size == 0:
        raise ValueError("heightmap has no finite values")
    return {
        "min": float(finite.min()),
        "max": float(finite.max()),
        "mean": float(finite.mean()),
        "std": float(finite.std()),
        "shape": tuple(hm.shape),
        "nodata_fraction": float(1.0 - finite.size / hm.size),
    }

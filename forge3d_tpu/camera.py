# forge3d_tpu/camera.py
# Camera math: look-at bases, projections, orbit cameras, ray generation.
#
# Parity notes (reference behavior): camera_look_at/perspective/orthographic/
# view_proj native fns (SURVEY A.7); ray-from-NDC convention of the hybrid PT
# kernels (/root/reference/src/shaders/hybrid_terrain_traversal.wgsl:409-425):
#   rd_cam = normalize(ndc_x*half_w, ndc_y*half_h, -1)
#   rd     = normalize(rd_cam.x*right + rd_cam.y*up + rd_cam.z*(-forward))
# with forward = normalize(look_at - origin), right = forward x up,
# up = right x forward (render_terrain.rs:602-606).

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import numpy as np


def _normalize(v: np.ndarray) -> np.ndarray:
    n = float(np.linalg.norm(v))
    if n == 0.0:
        raise ValueError("cannot normalize zero vector")
    return v / n


def camera_basis(origin, look_at, up) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (right, up, forward) unit vectors, reference convention."""
    origin = np.asarray(origin, np.float32)
    look_at = np.asarray(look_at, np.float32)
    up_in = np.asarray(up, np.float32)
    fwd = _normalize(look_at - origin)
    right = _normalize(np.cross(fwd, up_in))
    up_v = _normalize(np.cross(right, fwd))
    return right.astype(np.float32), up_v.astype(np.float32), fwd.astype(np.float32)


def camera_look_at(origin, target, up) -> np.ndarray:
    """Right-handed view matrix (world -> view), 4x4 float32."""
    origin = np.asarray(origin, np.float64)
    right, up_v, fwd = camera_basis(origin, target, up)
    m = np.eye(4, dtype=np.float64)
    m[0, :3] = right
    m[1, :3] = up_v
    m[2, :3] = -fwd
    m[:3, 3] = -m[:3, :3] @ origin
    return m.astype(np.float32)


def camera_perspective(fov_y_deg: float, aspect: float, znear: float, zfar: float) -> np.ndarray:
    """Right-handed perspective projection (wgpu clip space, z in [0,1])."""
    if znear <= 0 or zfar <= znear:
        raise ValueError("require 0 < znear < zfar")
    f = 1.0 / math.tan(math.radians(fov_y_deg) * 0.5)
    m = np.zeros((4, 4), dtype=np.float64)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = zfar / (znear - zfar)
    m[2, 3] = (znear * zfar) / (znear - zfar)
    m[3, 2] = -1.0
    return m.astype(np.float32)


def camera_orthographic(left, right, bottom, top, znear, zfar) -> np.ndarray:
    m = np.eye(4, dtype=np.float64)
    m[0, 0] = 2.0 / (right - left)
    m[1, 1] = 2.0 / (top - bottom)
    m[2, 2] = 1.0 / (znear - zfar)
    m[0, 3] = -(right + left) / (right - left)
    m[1, 3] = -(top + bottom) / (top - bottom)
    m[2, 3] = znear / (znear - zfar)
    return m.astype(np.float32)


def camera_view_proj(origin, target, up, fov_y_deg, aspect, znear, zfar) -> np.ndarray:
    return (
        camera_perspective(fov_y_deg, aspect, znear, zfar) @ camera_look_at(origin, target, up)
    ).astype(np.float32)


def camera_dof_params(focus_distance: float, f_stop: float, focal_length_mm: float = 50.0) -> dict:
    """Thin-lens DOF parameters (reference: camera_dof_params)."""
    if focus_distance <= 0 or f_stop <= 0 or focal_length_mm <= 0:
        raise ValueError("focus_distance, f_stop, focal_length must be > 0")
    aperture = (focal_length_mm / 1000.0) / f_stop
    return {
        "aperture_radius": aperture * 0.5,
        "focus_distance": float(focus_distance),
        "focal_length_m": focal_length_mm / 1000.0,
    }


@dataclass(frozen=True)
class PinholeCamera:
    """Immutable pinhole camera; the single source of ray-generation truth.

    All render paths (terrain PT reference, megakernel, raster-equivalent
    renderer) generate rays through this so AOVs and beauty ray footprints
    agree, mirroring the shared Uniforms camera block of the reference
    (src/path_tracing/compute_types.rs:5-20).
    """

    origin: tuple
    right: tuple
    up: tuple
    forward: tuple
    fov_y_rad: float
    aspect: float
    exposure: float = 1.0

    @staticmethod
    def from_lookat(origin, look_at, up=(0.0, 1.0, 0.0), fov_y_deg=45.0,
                    aspect=1.0, exposure=1.0) -> "PinholeCamera":
        r, u, f = camera_basis(origin, look_at, up)
        return PinholeCamera(
            origin=tuple(float(x) for x in np.asarray(origin, np.float32)),
            right=tuple(float(x) for x in r),
            up=tuple(float(x) for x in u),
            forward=tuple(float(x) for x in f),
            fov_y_rad=float(math.radians(fov_y_deg)),
            aspect=float(aspect),
            exposure=float(exposure),
        )


def orbit_camera_origin(target, radius: float, phi_deg: float, theta_deg: float):
    """Orbit camera position from spherical angles about a target.

    phi = azimuth (deg, about +Y), theta = elevation (deg above horizon).
    """
    phi = math.radians(phi_deg)
    theta = math.radians(theta_deg)
    t = np.asarray(target, np.float64)
    offs = np.array(
        [
            radius * math.cos(theta) * math.cos(phi),
            radius * math.sin(theta),
            radius * math.cos(theta) * math.sin(phi),
        ]
    )
    return (t + offs).astype(np.float32)

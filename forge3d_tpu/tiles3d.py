# forge3d_tpu/tiles3d.py
# 3D Tiles: tileset.json traversal with screen-space-error refinement,
# b3dm (batched glTF) and pnts (point cloud) decode.
#
# Parity notes (reference behavior, not code): /root/reference/src/tiles3d/
# (mod.rs:1-13) + python/forge3d/tiles3d.py parse a Cesium 3D Tiles
# tileset, traverse by geometricError vs screen-space error, and decode
# b3dm/pnts payloads; `decode_pnts_py` seam. Host-side; decoded meshes
# feed the BVH/mesh tracer, points feed pointcloud.render_points.

from __future__ import annotations

import json
import math
import struct
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from .errors import RenderError

__all__ = ["Tileset", "load_tileset", "decode_b3dm", "decode_pnts",
           "Tiles3dError", "select_tiles"]


class Tiles3dError(RenderError):
    pass


@dataclass
class Tile:
    bounding_volume: dict
    geometric_error: float
    refine: str
    content_uri: Optional[str]
    transform: np.ndarray
    children: List["Tile"] = field(default_factory=list)

    def bounding_sphere(self) -> Tuple[np.ndarray, float]:
        """(center, radius) in tile-local coordinates."""
        bv = self.bounding_volume
        if "sphere" in bv:
            s = bv["sphere"]
            return np.asarray(s[:3], np.float64), float(s[3])
        if "box" in bv:
            b = np.asarray(bv["box"], np.float64)
            center = b[:3]
            half = np.abs(b[3:6]) + np.abs(b[6:9]) + np.abs(b[9:12])
            return center, float(np.linalg.norm(half))
        if "region" in bv:
            # (west, south, east, north, minh, maxh) radians: coarse sphere
            w, s, e, n, h0, h1 = bv["region"]
            R = 6378137.0
            cx = (w + e) / 2
            cy = (s + n) / 2
            center = np.array([R * cx, R * cy, (h0 + h1) / 2])
            radius = max(R * (e - w), R * (n - s), h1 - h0) / 2 + 1.0
            return center, float(radius)
        raise Tiles3dError("unsupported boundingVolume")


@dataclass
class Tileset:
    root: Tile
    geometric_error: float
    asset: dict
    base_dir: Path


def _parse_tile(node: dict, parent_transform: np.ndarray) -> Tile:
    tr = np.asarray(node.get("transform",
                             [1, 0, 0, 0, 0, 1, 0, 0,
                              0, 0, 1, 0, 0, 0, 0, 1]),
                    np.float64).reshape(4, 4).T
    world = parent_transform @ tr
    content = node.get("content", {})
    uri = content.get("uri", content.get("url"))
    tile = Tile(
        bounding_volume=node.get("boundingVolume", {}),
        geometric_error=float(node.get("geometricError", 0.0)),
        refine=node.get("refine", "REPLACE").upper(),
        content_uri=uri,
        transform=world,
    )
    for child in node.get("children", []):
        tile.children.append(_parse_tile(child, world))
    return tile


def load_tileset(path) -> Tileset:
    path = Path(str(path))
    doc = json.loads(path.read_text())
    if "root" not in doc:
        raise Tiles3dError("tileset.json missing root")
    return Tileset(
        root=_parse_tile(doc["root"], np.eye(4)),
        geometric_error=float(doc.get("geometricError", 0.0)),
        asset=doc.get("asset", {}),
        base_dir=path.parent,
    )


def select_tiles(tileset: Tileset, eye, *, sse_threshold: float = 16.0,
                 fov_y_deg: float = 45.0, screen_height: int = 1080
                 ) -> List[Tile]:
    """Traverse by screen-space error: refine while
    sse = geometricError * screen_factor / distance > threshold
    (the standard 3D Tiles refinement rule)."""
    eye = np.asarray(eye, np.float64)
    k = screen_height / (2 * math.tan(math.radians(fov_y_deg) / 2))
    out: List[Tile] = []

    def visit(tile: Tile):
        center, radius = tile.bounding_sphere()
        center_w = (tile.transform @ np.append(center, 1.0))[:3]
        dist = max(float(np.linalg.norm(center_w - eye)) - radius, 1e-3)
        sse = tile.geometric_error * k / dist
        if sse > sse_threshold and tile.children:
            if tile.refine == "ADD" and tile.content_uri:
                out.append(tile)
            for c in tile.children:
                visit(c)
        elif tile.content_uri:
            out.append(tile)

    visit(tileset.root)
    return out


# ---------------------------------------------------------------------------
# payload decoders


def _read_feature_batch(raw: bytes, magic: bytes):
    if raw[:4] != magic:
        raise Tiles3dError(f"bad magic: {raw[:4]!r} != {magic!r}")
    version, byte_len, ftj_len, ftb_len, btj_len, btb_len = struct.unpack(
        "<6I", raw[4:28])
    if version != 1:
        raise Tiles3dError(f"unsupported {magic.decode()} version {version}")
    off = 28
    ftj = json.loads(raw[off:off + ftj_len] or b"{}")
    off += ftj_len
    ftb = raw[off:off + ftb_len]
    off += ftb_len
    btj = json.loads(raw[off:off + btj_len] or b"{}")
    off += btj_len
    btb = raw[off:off + btb_len]
    off += btb_len
    return ftj, ftb, btj, btb, raw[off:byte_len]


def decode_b3dm(data: bytes) -> dict:
    """Decode a b3dm payload -> {meshes: [MeshData], feature_table,
    batch_table, rtc_center}."""
    ftj, ftb, btj, btb, body = _read_feature_batch(data, b"b3dm")
    import tempfile

    from .io.mesh import load_gltf

    # body is a GLB; write to a temp file for the GLB reader
    with tempfile.NamedTemporaryFile(suffix=".glb", delete=False) as fh:
        fh.write(body)
        tmp = fh.name
    try:
        meshes = load_gltf(tmp)
    finally:
        import os

        os.unlink(tmp)
    rtc = ftj.get("RTC_CENTER")
    if rtc:
        for m in meshes:
            m.vertices = m.vertices + np.asarray(rtc, np.float32)
    return {"meshes": meshes, "feature_table": ftj, "batch_table": btj,
            "rtc_center": rtc}


def decode_pnts(data: bytes) -> dict:
    """Decode a pnts payload -> {positions (N,3) f32, colors, normals,
    feature_table} (reference seam: decode_pnts_py)."""
    ftj, ftb, btj, btb, _ = _read_feature_batch(data, b"pnts")
    n = int(ftj.get("POINTS_LENGTH", 0))
    out = {"feature_table": ftj, "batch_table": btj, "count": n,
           "positions": None, "colors": None, "normals": None}

    def sect(key, dtype, ncomp):
        ref = ftj.get(key)
        if ref is None:
            return None
        off = ref["byteOffset"] if isinstance(ref, dict) else int(ref)
        nbytes = n * ncomp * np.dtype(dtype).itemsize
        return np.frombuffer(ftb[off:off + nbytes],
                             dtype).reshape(n, ncomp).copy()

    pos = sect("POSITION", "<f4", 3)
    if pos is None and "POSITION_QUANTIZED" in ftj:
        q = sect("POSITION_QUANTIZED", "<u2", 3).astype(np.float32)
        scale = np.asarray(ftj["QUANTIZED_VOLUME_SCALE"], np.float32)
        offset = np.asarray(ftj["QUANTIZED_VOLUME_OFFSET"], np.float32)
        pos = q / 65535.0 * scale + offset
    if pos is None:
        raise Tiles3dError("pnts has no POSITION data")
    rtc = ftj.get("RTC_CENTER")
    if rtc:
        pos = pos + np.asarray(rtc, np.float32)
    out["positions"] = pos
    rgb = sect("RGB", np.uint8, 3)
    if rgb is not None:
        out["colors"] = rgb.astype(np.float32) / 255.0
    rgba = sect("RGBA", np.uint8, 4)
    if rgba is not None:
        out["colors"] = rgba[:, :3].astype(np.float32) / 255.0
    nrm = sect("NORMAL", "<f4", 3)
    if nrm is not None:
        out["normals"] = nrm
    return out

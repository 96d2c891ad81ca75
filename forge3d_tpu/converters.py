# forge3d_tpu/converters.py — geometry format converters.
#
# Parity notes (reference behavior, not code): the reference ships a
# MultipolygonZ -> OBJ converter (src/converters/multipolygonz_to_obj.rs:
# fan triangulation per ring, per-face normals, OBJ write). Same
# contract here over io.mesh.MeshData.

from __future__ import annotations

from typing import Sequence

import numpy as np

from .io.mesh import MeshData, save_obj

__all__ = ["multipolygonz_to_mesh", "multipolygonz_to_obj"]


def multipolygonz_to_mesh(polygons: Sequence[np.ndarray]) -> MeshData:
    """Fan-triangulate 3D polygon rings (no holes) into one mesh with
    per-vertex face normals."""
    positions = []
    normals = []
    indices = []
    for ring in polygons:
        ring = np.asarray(ring, np.float32).reshape(-1, 3)
        if len(ring) < 3:
            continue
        base = len(positions)
        n = np.cross(ring[1] - ring[0], ring[2] - ring[0])
        ln = float(np.linalg.norm(n))
        n = n / ln if ln > 0 else np.zeros(3, np.float32)
        positions.extend(ring.tolist())
        normals.extend([n.tolist()] * len(ring))
        for i in range(1, len(ring) - 1):
            indices.append([base, base + i, base + i + 1])
    if not positions:
        raise ValueError("no triangulatable rings")
    return MeshData(vertices=np.asarray(positions, np.float32),
                    indices=np.asarray(indices, np.uint32),
                    normals=np.asarray(normals, np.float32))


def multipolygonz_to_obj(path, polygons: Sequence[np.ndarray]) -> MeshData:
    """Convert and write an OBJ; returns the mesh."""
    mesh = multipolygonz_to_mesh(polygons)
    save_obj(path, mesh)
    return mesh

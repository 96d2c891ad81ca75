# forge3d_tpu/geometry — host-side geometry engine.
#
# Parity notes (reference behavior, not code): /root/reference/src/geometry/
# mod.rs:10-37 exposes primitives, polygon extrusion (buildings), weld,
# simplify, subdivision, curves, displacement, validation/repair, measures,
# planar UV unwrap. All host-side numpy; outputs feed the SAH BVH and mesh
# path tracer. The exact-predicate boolean overlay (EUCLIDEA,
# src/geometry/exact/, overlay/) lives in geometry/overlay.py.

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..io.mesh import MeshData, merge_meshes

__all__ = [
    "primitive_mesh", "extrude_polygon", "triangulate_polygon",
    "weld_mesh", "simplify_mesh", "subdivide_mesh",
    "mesh_info", "validate_mesh", "repair_mesh",
    "geometry_centroid", "geometry_measure", "uv_planar_unwrap",
    "displace_mesh", "merge_meshes",
]


# ---------------------------------------------------------------------------
# Primitives (reference: src/geometry/primitives)


def primitive_mesh(kind: str, **kw) -> MeshData:
    """Factory: plane|box|sphere|cylinder|cone|torus."""
    makers = {"plane": _plane, "box": _box, "sphere": _sphere,
              "cylinder": _cylinder, "cone": _cone, "torus": _torus}
    try:
        maker = makers[kind]
    except KeyError:
        raise ValueError(f"unknown primitive: {kind!r}") from None
    m = maker(**kw)
    m.name = kind
    return m


def _grid_faces(nx: int, ny: int) -> np.ndarray:
    i, j = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    v00 = (i * (nx + 1) + j).ravel()
    v10, v01 = v00 + 1, v00 + nx + 1
    v11 = v01 + 1
    return np.concatenate([np.stack([v00, v10, v11], 1),
                           np.stack([v00, v11, v01], 1)]).astype(np.uint32)


def _plane(size: Tuple[float, float] = (1.0, 1.0), resolution: Tuple[int, int] = (1, 1)) -> MeshData:
    nx, ny = resolution
    x = np.linspace(-size[0] / 2, size[0] / 2, nx + 1, dtype=np.float32)
    z = np.linspace(-size[1] / 2, size[1] / 2, ny + 1, dtype=np.float32)
    zz, xx = np.meshgrid(z, x, indexing="ij")
    verts = np.stack([xx, np.zeros_like(xx), zz], -1).reshape(-1, 3)
    uu, vv = np.meshgrid(np.linspace(0, 1, nx + 1), np.linspace(0, 1, ny + 1), indexing="xy")
    uvs = np.stack([uu, vv], -1).reshape(-1, 2).astype(np.float32)
    normals = np.tile(np.array([[0, 1, 0]], np.float32), (len(verts), 1))
    return MeshData(verts, _grid_faces(nx, ny), normals=normals, uvs=uvs)


def _box(size: Tuple[float, float, float] = (1.0, 1.0, 1.0)) -> MeshData:
    hx, hy, hz = (s / 2 for s in size)
    faces_def = [  # (normal, right, up)
        ((0, 0, 1), (1, 0, 0), (0, 1, 0)), ((0, 0, -1), (-1, 0, 0), (0, 1, 0)),
        ((1, 0, 0), (0, 0, -1), (0, 1, 0)), ((-1, 0, 0), (0, 0, 1), (0, 1, 0)),
        ((0, 1, 0), (1, 0, 0), (0, 0, -1)), ((0, -1, 0), (1, 0, 0), (0, 0, 1))]
    h = np.array([hx, hy, hz])
    vs, ns, ts, fs = [], [], [], []
    for fi, (n, r, u) in enumerate(faces_def):
        n, r, u = (np.array(a, np.float64) for a in (n, r, u))
        c = n * h
        for sy in (-1, 1):
            for sx in (-1, 1):
                vs.append(c + sx * r * h + sy * u * h)
                ns.append(n)
                ts.append([(sx + 1) / 2, (sy + 1) / 2])
        b = fi * 4
        fs += [[b, b + 1, b + 3], [b, b + 3, b + 2]]
    return MeshData(np.asarray(vs, np.float32), np.asarray(fs, np.uint32),
                    normals=np.asarray(ns, np.float32), uvs=np.asarray(ts, np.float32))


def _sphere(radius: float = 0.5, rings: int = 16, segments: int = 32) -> MeshData:
    phi = np.linspace(0, math.pi, rings + 1)
    theta = np.linspace(0, 2 * math.pi, segments + 1)
    pp, tt = np.meshgrid(phi, theta, indexing="ij")
    x = np.sin(pp) * np.cos(tt)
    y = np.cos(pp)
    z = np.sin(pp) * np.sin(tt)
    n = np.stack([x, y, z], -1).reshape(-1, 3)
    verts = (radius * n).astype(np.float32)
    uvs = np.stack([tt / (2 * math.pi), 1 - pp / math.pi], -1).reshape(-1, 2).astype(np.float32)
    return MeshData(verts, _grid_faces(segments, rings), normals=n.astype(np.float32), uvs=uvs)


def _lathe(profile_r, profile_y, segments: int, cap_bottom=True, cap_top=True) -> MeshData:
    """Revolve an (r, y) profile around Y."""
    theta = np.linspace(0, 2 * math.pi, segments + 1)
    rr = np.asarray(profile_r, np.float64)
    yy = np.asarray(profile_y, np.float64)
    R, T = np.meshgrid(rr, theta, indexing="ij")
    Y = np.meshgrid(yy, theta, indexing="ij")[0]
    verts = np.stack([R * np.cos(T), Y, R * np.sin(T)], -1).reshape(-1, 3)
    # profile rows ascend in y (opposite the sphere's phi convention):
    # flip winding so side faces point outward
    faces = _grid_faces(segments, len(rr) - 1)[:, ::-1].copy()
    mesh = MeshData(verts.astype(np.float32), faces)
    parts = [mesh]
    if cap_bottom and rr[0] > 0:
        parts.append(_disc(rr[0], yy[0], segments, up=False))
    if cap_top and rr[-1] > 0:
        parts.append(_disc(rr[-1], yy[-1], segments, up=True))
    out = merge_meshes(parts) if len(parts) > 1 else mesh
    out.compute_normals()
    return out


def _disc(radius: float, y: float, segments: int, up: bool) -> MeshData:
    theta = np.linspace(0, 2 * math.pi, segments + 1)[:-1]
    rim = np.stack([radius * np.cos(theta), np.full_like(theta, y),
                    radius * np.sin(theta)], -1)
    verts = np.concatenate([[[0, y, 0]], rim]).astype(np.float32)
    fs = []
    for k in range(segments):
        a, b = 1 + k, 1 + (k + 1) % segments
        fs.append([0, b, a] if up else [0, a, b])
    return MeshData(verts, np.asarray(fs, np.uint32))


def _cylinder(radius: float = 0.5, height: float = 1.0, segments: int = 32) -> MeshData:
    return _lathe([radius, radius], [-height / 2, height / 2], segments)


def _cone(radius: float = 0.5, height: float = 1.0, segments: int = 32) -> MeshData:
    return _lathe([radius, 1e-6], [-height / 2, height / 2], segments, cap_top=False)


def _torus(radius: float = 0.5, tube_radius: float = 0.2, rings: int = 24,
           segments: int = 32) -> MeshData:
    u = np.linspace(0, 2 * math.pi, rings + 1)
    v = np.linspace(0, 2 * math.pi, segments + 1)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    cx, cz = radius * np.cos(uu), radius * np.sin(uu)
    x = (radius + tube_radius * np.cos(vv)) * np.cos(uu)
    z = (radius + tube_radius * np.cos(vv)) * np.sin(uu)
    y = tube_radius * np.sin(vv)
    verts = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    n = np.stack([x - cx, y, z - cz], -1).reshape(-1, 3)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
    return MeshData(verts, _grid_faces(segments, rings), normals=n.astype(np.float32))


# ---------------------------------------------------------------------------
# Polygon triangulation + extrusion (reference: src/geometry/extrude,
# src/import/osm_buildings.rs builds on this)


def _signed_area(poly: np.ndarray) -> float:
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def triangulate_polygon(exterior: np.ndarray,
                        holes: Sequence[np.ndarray] = ()) -> Tuple[np.ndarray, np.ndarray]:
    """Ear-clipping triangulation of a simple polygon with holes.

    Holes are joined to the outer ring by max-x bridge edges (standard
    hole-cutting), then ears are clipped with robust orientation tests.
    Returns (vertices (N,2) float64, triangles (M,3) uint32).
    """
    outer = np.asarray(exterior, np.float64)[:, :2]
    if np.allclose(outer[0], outer[-1]):
        outer = outer[:-1]
    if _signed_area(outer) < 0:
        outer = outer[::-1]
    ring = list(map(tuple, outer))

    hole_list = []
    for h in holes:
        h = np.asarray(h, np.float64)[:, :2]
        if np.allclose(h[0], h[-1]):
            h = h[:-1]
        if _signed_area(h) > 0:
            h = h[::-1]  # holes clockwise
        hole_list.append(h)
    # join holes right-to-left by max-x vertex
    hole_list.sort(key=lambda h: -float(np.max(h[:, 0])))
    for h in hole_list:
        hi = int(np.argmax(h[:, 0]))
        hx, hy = h[hi]
        # nearest visible outer vertex to the right
        best, bestd = None, np.inf
        for i, (px, py) in enumerate(ring):
            if px >= hx:
                d = (px - hx) ** 2 + (py - hy) ** 2
                if d < bestd:
                    best, bestd = i, d
        if best is None:
            best = int(np.argmax([p[0] for p in ring]))
        bridge = ring[best]
        rotated = [tuple(p) for p in np.roll(h, -hi, axis=0)]
        ring = (ring[: best + 1] + rotated + [rotated[0], bridge] + ring[best + 1:])

    verts = np.asarray(ring, np.float64)
    n = len(verts)
    prev = list(range(-1, n - 1))
    nxt = list(range(1, n + 1))
    nxt[-1] = 0
    prev[0] = n - 1

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def point_in_tri(p, a, b, c):
        d1, d2, d3 = cross(a, b, p), cross(b, c, p), cross(c, a, p)
        neg = (d1 < 0) or (d2 < 0) or (d3 < 0)
        pos = (d1 > 0) or (d2 > 0) or (d3 > 0)
        return not (neg and pos)

    tris: List[List[int]] = []
    remaining = n
    i = 0
    guard = 0
    while remaining > 3 and guard < 4 * n * n:
        guard += 1
        p, q = prev[i], nxt[i]
        a, b, c = verts[p], verts[i], verts[q]
        if cross(a, b, c) > 1e-14:
            ear = True
            j = nxt[q]
            while j != p:
                if j != p and j != i and j != q:
                    vj = verts[j]
                    if (not (np.array_equal(vj, a) or np.array_equal(vj, b)
                             or np.array_equal(vj, c))
                            and point_in_tri(vj, a, b, c)):
                        ear = False
                        break
                j = nxt[j]
            if ear:
                tris.append([p, i, q])
                nxt[p], prev[q] = q, p
                remaining -= 1
                i = q
                continue
        i = nxt[i]
    if remaining == 3:
        tris.append([prev[i], i, nxt[i]])
    return verts, np.asarray(tris, np.uint32).reshape(-1, 3)


def extrude_polygon(polygon, height: float, *, base: float = 0.0,
                    holes: Sequence = (), cap_bottom: bool = True) -> MeshData:
    """Extrude a 2D footprint (x, z) to a prism [base, base+height] in y.

    Reference seam: `extrude_polygon_py` (src/py_module registration,
    SURVEY §A.7). The roof is ear-clip triangulated; walls are quads per
    edge with outward winding.
    """
    verts2, tris = triangulate_polygon(np.asarray(polygon, np.float64), holes)
    nv = len(verts2)
    top_y, bot_y = base + height, base
    top = np.column_stack([verts2[:, 0], np.full(nv, top_y), verts2[:, 1]])
    bot = np.column_stack([verts2[:, 0], np.full(nv, bot_y), verts2[:, 1]])
    parts = [MeshData(top.astype(np.float32), tris)]
    if cap_bottom:
        parts.append(MeshData(bot.astype(np.float32), tris[:, ::-1].copy()))

    def ring_walls(ring: np.ndarray, ccw: bool) -> MeshData:
        r = np.asarray(ring, np.float64)[:, :2]
        if np.allclose(r[0], r[-1]):
            r = r[:-1]
        if (_signed_area(r) > 0) != ccw:
            r = r[::-1]
        m = len(r)
        t = np.column_stack([r[:, 0], np.full(m, top_y), r[:, 1]])
        b = np.column_stack([r[:, 0], np.full(m, bot_y), r[:, 1]])
        vs = np.concatenate([b, t]).astype(np.float32)
        fs = []
        for k in range(m):
            k2 = (k + 1) % m
            # wall quad (bottom k, bottom k2, top k2, top k)
            fs += [[k, k2, m + k2], [k, m + k2, m + k]]
        return MeshData(vs, np.asarray(fs, np.uint32))

    parts.append(ring_walls(np.asarray(polygon, np.float64), ccw=True))
    for h in holes:
        parts.append(ring_walls(np.asarray(h, np.float64), ccw=False))
    mesh = merge_meshes(parts)
    mesh.compute_normals()
    mesh.name = "extrusion"
    return mesh


# ---------------------------------------------------------------------------
# Weld / simplify / subdivide (reference: src/geometry weld/simplify/subdivision)


def weld_mesh(mesh: MeshData, *, tolerance: float = 1e-6) -> MeshData:
    """Merge vertices closer than tolerance (grid quantization), drop
    degenerate triangles."""
    q = np.round(mesh.vertices / max(tolerance, 1e-30)).astype(np.int64)
    _, first, inv = np.unique(q, axis=0, return_index=True, return_inverse=True)
    order = np.argsort(first, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    new_idx = rank[inv]
    verts = mesh.vertices[first[order]]
    faces = new_idx[mesh.indices.astype(np.int64)]
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
          & (faces[:, 0] != faces[:, 2]))
    out = MeshData(verts, faces[ok].astype(np.uint32), name=mesh.name)
    if mesh.normals is not None:
        out.compute_normals()
    return out


def simplify_mesh(mesh: MeshData, *, target_ratio: float = 0.5,
                  grid: Optional[int] = None) -> MeshData:
    """Vertex-clustering decimation: snap vertices to a uniform grid sized
    to approximately hit target_ratio triangles, merge, drop degenerates.
    Deterministic (cluster representative = mean position)."""
    if not (0 < target_ratio <= 1):
        raise ValueError("target_ratio in (0, 1]")
    if target_ratio == 1.0:
        return mesh
    bb_min = mesh.vertices.min(0)
    bb_max = mesh.vertices.max(0)
    extent = float(np.max(bb_max - bb_min))
    if grid is None:
        # heuristic: triangles scale ~ cells²; solve for resolution
        grid = max(2, int(math.sqrt(mesh.triangle_count * target_ratio / 2.0)))
    cell = extent / grid if extent > 0 else 1.0
    key = np.floor((mesh.vertices - bb_min) / max(cell, 1e-30)).astype(np.int64)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    # mean position per cluster
    pos = np.zeros((len(uniq), 3), np.float64)
    cnt = np.zeros(len(uniq), np.int64)
    np.add.at(pos, inv, mesh.vertices.astype(np.float64))
    np.add.at(cnt, inv, 1)
    pos /= np.maximum(cnt[:, None], 1)
    faces = inv[mesh.indices.astype(np.int64)]
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
          & (faces[:, 0] != faces[:, 2]))
    faces = faces[ok]
    # drop duplicate faces (any rotation)
    canon = np.sort(faces, axis=1)
    _, fi = np.unique(canon, axis=0, return_index=True)
    faces = faces[np.sort(fi)]
    out = MeshData(pos.astype(np.float32), faces.astype(np.uint32), name=mesh.name)
    out.compute_normals()
    return out


def subdivide_mesh(mesh: MeshData, *, levels: int = 1, smooth: bool = False) -> MeshData:
    """Midpoint 1:4 subdivision; smooth=True applies Loop vertex smoothing."""
    v = mesh.vertices.astype(np.float64)
    f = mesh.indices.astype(np.int64)
    for _ in range(max(0, int(levels))):
        edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        ek = np.sort(edges, axis=1)
        uniq, inv = np.unique(ek, axis=0, return_inverse=True)
        mid = 0.5 * (v[uniq[:, 0]] + v[uniq[:, 1]])
        if smooth:
            # Loop: edge point = 3/8 (a+b) + 1/8 (c+d) for interior edges
            e_ab = uniq
            opp = np.full((len(uniq), 2), -1, np.int64)
            opp_count = np.zeros(len(uniq), np.int64)
            thirds = np.stack([f[:, 2], f[:, 0], f[:, 1]]).T.reshape(-1)
            for e_idx, t in zip(inv, thirds):
                c = opp_count[e_idx]
                if c < 2:
                    opp[e_idx, c] = t
                opp_count[e_idx] += 1
            interior = opp_count == 2
            mid_s = mid.copy()
            mid_s[interior] = (0.375 * (v[e_ab[interior, 0]] + v[e_ab[interior, 1]])
                               + 0.125 * (v[opp[interior, 0]] + v[opp[interior, 1]]))
            mid = mid_s
        e0 = inv[: len(f)] + len(v)
        e1 = inv[len(f): 2 * len(f)] + len(v)
        e2 = inv[2 * len(f):] + len(v)
        if smooth:
            # Loop even-vertex rule
            deg = np.zeros(len(v), np.int64)
            acc = np.zeros_like(v)
            np.add.at(deg, uniq[:, 0], 1)
            np.add.at(deg, uniq[:, 1], 1)
            np.add.at(acc, uniq[:, 0], v[uniq[:, 1]])
            np.add.at(acc, uniq[:, 1], v[uniq[:, 0]])
            k = np.maximum(deg, 1)
            beta = np.where(deg > 3, 3.0 / (8.0 * k),
                            np.where(deg == 3, 3.0 / 16.0, 1.0 / 8.0))
            v_new = v * (1 - k * beta)[:, None] + acc * beta[:, None]
            v = np.concatenate([np.where((deg > 0)[:, None], v_new, v), mid])
        else:
            v = np.concatenate([v, mid])
        f = np.concatenate([
            np.stack([f[:, 0], e0, e2], 1),
            np.stack([e0, f[:, 1], e1], 1),
            np.stack([e2, e1, f[:, 2]], 1),
            np.stack([e0, e1, e2], 1)])
    out = MeshData(v.astype(np.float32), f.astype(np.uint32), name=mesh.name)
    out.compute_normals()
    return out


def displace_mesh(mesh: MeshData, heights: np.ndarray, *, scale: float = 1.0) -> MeshData:
    """Displace vertices along normals by a per-vertex height array."""
    if mesh.normals is None:
        mesh.compute_normals()
    h = np.asarray(heights, np.float32).reshape(-1)
    if len(h) != mesh.vertex_count:
        raise ValueError("heights length must equal vertex count")
    v = mesh.vertices + mesh.normals * (h[:, None] * scale)
    out = MeshData(v, mesh.indices.copy(), uvs=mesh.uvs, name=mesh.name)
    out.compute_normals()
    return out


# ---------------------------------------------------------------------------
# Validation / repair / measures


def mesh_info(mesh: MeshData) -> dict:
    v, f = mesh.vertices, mesh.indices.astype(np.int64)
    edges = np.sort(np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1)
    uniq, counts = np.unique(edges, axis=0, return_counts=True)
    tri = v[f]
    area = 0.5 * np.linalg.norm(np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
    return {
        "vertices": mesh.vertex_count,
        "triangles": mesh.triangle_count,
        "edges": int(len(uniq)),
        "boundary_edges": int(np.sum(counts == 1)),
        "nonmanifold_edges": int(np.sum(counts > 2)),
        "euler_characteristic": int(mesh.vertex_count - len(uniq) + mesh.triangle_count),
        "watertight": bool(np.all(counts == 2)),
        "surface_area": float(area.sum()),
        "aabb": (tuple(map(float, v.min(0))), tuple(map(float, v.max(0)))),
    }


def validate_mesh(mesh: MeshData) -> List[str]:
    """Returns a list of issues; empty list = valid."""
    issues = []
    f = mesh.indices.astype(np.int64)
    if f.size and f.max() >= mesh.vertex_count:
        issues.append("index_out_of_range")
    if not np.all(np.isfinite(mesh.vertices)):
        issues.append("nonfinite_vertices")
    degen = ((f[:, 0] == f[:, 1]) | (f[:, 1] == f[:, 2]) | (f[:, 0] == f[:, 2]))
    if degen.any():
        issues.append(f"degenerate_triangles:{int(degen.sum())}")
    tri = mesh.vertices[np.clip(f, 0, mesh.vertex_count - 1)]
    area = 0.5 * np.linalg.norm(np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
    zero = (area < 1e-12) & ~degen
    if zero.any():
        issues.append(f"zero_area_triangles:{int(zero.sum())}")
    used = np.zeros(mesh.vertex_count, bool)
    used[np.clip(f.ravel(), 0, mesh.vertex_count - 1)] = True
    if not used.all():
        issues.append(f"unused_vertices:{int((~used).sum())}")
    info = mesh_info(mesh)
    if info["nonmanifold_edges"]:
        issues.append(f"nonmanifold_edges:{info['nonmanifold_edges']}")
    return issues


def repair_mesh(mesh: MeshData) -> MeshData:
    """Drop degenerate/zero-area faces, NaN vertices, unused vertices."""
    f = mesh.indices.astype(np.int64)
    finite = np.all(np.isfinite(mesh.vertices), axis=1)
    face_ok = finite[f].all(axis=1)
    face_ok &= (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
    tri = mesh.vertices[np.clip(f, 0, mesh.vertex_count - 1)]
    area = 0.5 * np.linalg.norm(np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
    face_ok &= area > 1e-12
    f = f[face_ok]
    used = np.unique(f.ravel())
    remap = np.full(mesh.vertex_count, -1, np.int64)
    remap[used] = np.arange(len(used))
    out = MeshData(mesh.vertices[used], remap[f].astype(np.uint32), name=mesh.name)
    if mesh.uvs is not None:
        out.uvs = mesh.uvs[used]
    out.compute_normals()
    return out


def geometry_centroid(mesh: MeshData) -> Tuple[float, float, float]:
    """Area-weighted surface centroid."""
    tri = mesh.vertices[mesh.indices.astype(np.int64)]
    area = 0.5 * np.linalg.norm(np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
    c = tri.mean(axis=1)
    w = area / max(float(area.sum()), 1e-30)
    return tuple(map(float, (c * w[:, None]).sum(0)))


def geometry_measure(mesh: MeshData) -> dict:
    """Surface area + signed volume (divergence theorem) + AABB."""
    tri = mesh.vertices.astype(np.float64)[mesh.indices.astype(np.int64)]
    cross = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = 0.5 * np.linalg.norm(cross, axis=1)
    vol = float(np.sum(np.einsum("ij,ij->i", tri[:, 0], cross)) / 6.0)
    return {"surface_area": float(area.sum()), "volume": vol,
            "aabb": (tuple(map(float, mesh.vertices.min(0))),
                     tuple(map(float, mesh.vertices.max(0))))}


def uv_planar_unwrap(mesh: MeshData, *, axis: str = "y") -> np.ndarray:
    """Planar-project UVs along an axis, normalized to [0,1]²
    (reference seam: uv_planar_unwrap_py)."""
    drop = {"x": 0, "y": 1, "z": 2}[axis]
    keep = [i for i in range(3) if i != drop]
    p = mesh.vertices[:, keep].astype(np.float64)
    lo, hi = p.min(0), p.max(0)
    span = np.maximum(hi - lo, 1e-30)
    mesh.uvs = ((p - lo) / span).astype(np.float32)
    return mesh.uvs

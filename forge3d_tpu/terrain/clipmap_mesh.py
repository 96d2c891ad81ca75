# forge3d_tpu/terrain/clipmap_mesh.py — reference-layout clipmap mesh.
#
# Parity notes (reference behavior, not code): the reference's clipmap
# camera mode rasterizes a CPU-generated center-block + nested-ring mesh
# (src/terrain/clipmap/{level.rs,ring.rs,vertex.rs}) through the terrain
# PBR pipeline (src/shaders/terrain_pbr_pom.wgsl vs_clipmap_main). The
# recipe goldens bake several layout quirks of that generator which are
# part of the pixel contract and are reproduced here deliberately:
#   - base_cell = extent / (center_resolution * 8); the center block
#     spans ±(base_cell * center_resolution / 2).
#   - each ring r covers [inner, inner + cell_r * ring_resolution] with
#     cell_r = base_cell * 2^r, built from 4 two-row strips whose columns
#     step 2*cell_r from the NEGATIVE outer corner — so strips cover only
#     [-outer, outer - 2*inner] along their run (clamped), leaving
#     L-shaped corner holes on the positive side ("corner patches are
#     currently handled by strip overlap" — ring.rs:204-218).
#   - heightmap UVs map [-extent/2, extent/2] -> [0, 1] and CLAMP, so
#     outer rings repeat the DEM edge rows.
#   - morph weight ramps to 1 over the outer `morph_range` fraction of
#     each strip; geomorphing blends the fine bilinear height with a
#     bilinear sample on a 2^(ring+1)-texel coarse grid
#     (vs_clipmap_main, terrain_pbr_pom.wgsl:4765-4800).
#   - every ring vertex gets a skirt twin flagged morph=-1, dropped by
#     ring_resolution * 0.001 in height units before exaggeration;
#     curtain quads connect only row-adjacent vertices (ring.rs:238-268).

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["ClipmapConfig", "build_clipmap_mesh", "clipmap_vertex_heights"]


@dataclass(frozen=True)
class ClipmapConfig:
    ring_count: int = 4
    ring_resolution: int = 32
    center_resolution: int = 32
    skirt_depth: float = 10.0
    morph_range: float = 0.3

    @classmethod
    def from_camera_mode(cls, camera_mode: str) -> "ClipmapConfig":
        """Parse the reference's "clipmap:rings:res:center:skirt:morph"
        camera-mode spelling (map_scene.py _mapscene_clipmap_camera_mode)."""
        parts = camera_mode.split(":")
        vals = parts[1:]
        get = lambda i, d: float(vals[i]) if i < len(vals) else d  # noqa: E731
        return cls(ring_count=int(get(0, 4)), ring_resolution=int(get(1, 64)),
                   center_resolution=int(get(2, 64)),
                   skirt_depth=get(3, 10.0), morph_range=get(4, 0.3))


def _strip_indices(base: int, width: int) -> np.ndarray:
    i = np.arange(width - 1)
    i0 = base + i
    i1 = i0 + 1
    i2 = i0 + width
    i3 = i2 + 1
    return np.stack([np.stack([i0, i2, i1], -1),
                     np.stack([i1, i2, i3], -1)], 1).reshape(-1, 3)


def build_clipmap_mesh(config: ClipmapConfig, center=(0.0, 0.0),
                       extent: float = 1.0):
    """Build the combined clipmap mesh.

    Returns (pos(N,2), uv(N,2), morph(N,2), tris(M,3)) where morph[:,0]
    is the geomorph weight (-1 flags skirt vertices) and morph[:,1] the
    ring index (0 for the center block).
    """
    cx, cy = float(center[0]), float(center[1])
    base_cell = extent / (config.center_resolution * 8.0)

    verts, uvs, morphs, tris = [], [], [], []

    def to_uv(wx, wz):
        u = (wx + extent * 0.5) / extent
        v = (wz + extent * 0.5) / extent
        return np.clip(u, 0.0, 1.0), np.clip(v, 0.0, 1.0)

    def emit(wx, wz, morph_w, ring):
        u, v = to_uv(wx, wz)
        verts.append(np.stack([wx, wz], -1))
        uvs.append(np.stack([u, v], -1))
        morphs.append(np.stack([np.asarray(morph_w, np.float64),
                                np.full_like(np.asarray(morph_w, np.float64),
                                             float(ring))], -1))

    n_total = 0

    # -- center block ------------------------------------------------------
    n = config.center_resolution
    half = base_cell * n * 0.5
    cell = (half * 2.0) / n
    xs = cx - half + np.arange(n + 1) * cell
    zs = cy - half + np.arange(n + 1) * cell
    wz, wx = np.meshgrid(zs, xs, indexing="ij")
    emit(wx.ravel(), wz.ravel(), np.zeros(wx.size), 0)
    stride = n + 1
    jj, ii = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    i0 = (jj * stride + ii).ravel()
    tris.append(np.stack([np.stack([i0, i0 + 1, i0 + stride], -1),
                          np.stack([i0 + 1, i0 + stride + 1, i0 + stride],
                                   -1)], 1).reshape(-1, 3))
    n_total = wx.size

    # -- rings -------------------------------------------------------------
    res = config.ring_resolution
    inner = half
    for r in range(config.ring_count):
        cell_r = base_cell * (1 << r)
        strip = cell_r * res
        outer = inner + strip

        ring_start = n_total
        ring_verts = 0
        morph_start = 1.0 - config.morph_range

        def calc_morph(dist):
            t = dist / strip
            return np.where(t > morph_start,
                            (t - morph_start) / config.morph_range, 0.0)

        cols = np.arange(res + 1)
        # strips: (axis along run, fixed rows, dist per row, clamps)
        run_x = cx - outer + cols * cell_r * 2.0
        run_x = np.minimum(run_x, cx + outer)
        run_z = cy - inner + cols * cell_r * 2.0
        run_z = np.minimum(run_z, cy + inner)
        strips = [
            # top (positive Z): rows z=+inner, z=+outer
            (run_x, (cy + inner, cy + outer), (0.0, strip), "x"),
            # bottom (negative Z): rows z=-outer, z=-inner
            (run_x, (cy - outer, cy - inner), (strip, 0.0), "x"),
            # left (negative X): rows x=-outer, x=-inner
            (run_z, (cx - outer, cx - inner), (strip, 0.0), "z"),
            # right (positive X): rows x=+inner, x=+outer
            (run_z, (cx + inner, cx + outer), (0.0, strip), "z"),
        ]
        for run, rows, dists, axis in strips:
            base = n_total + ring_verts
            for fixed, dist in zip(rows, dists):
                m = calc_morph(np.full(run.shape, dist))
                if axis == "x":
                    emit(run, np.full(run.shape, fixed), m, r)
                else:
                    emit(np.full(run.shape, fixed), run, m, r)
                ring_verts += run.size
            tris.append(_strip_indices(base, res + 1))
        n_total += ring_verts

        # skirts: one twin per ring vertex (morph=-1), curtains between
        # row-adjacent pairs only
        ring_pos = np.concatenate(verts[-8:], axis=0)  # 4 strips x 2 rows
        ring_uv = np.concatenate(uvs[-8:], axis=0)
        skirt_base = n_total
        verts.append(ring_pos.copy())
        uvs.append(ring_uv.copy())
        morphs.append(np.stack([np.full(len(ring_pos), -1.0),
                                np.full(len(ring_pos), float(r))], -1))
        row_w = res + 1
        idx = np.arange(len(ring_pos))
        sel = idx[(idx > 0) & ((idx % row_w) != 0)]
        prev = sel - 1
        t1 = np.stack([ring_start + prev, ring_start + sel,
                       skirt_base + prev], -1)
        t2 = np.stack([ring_start + sel, skirt_base + sel,
                       skirt_base + prev], -1)
        tris.append(np.concatenate([t1, t2], axis=0))
        n_total += len(ring_pos)

        inner = outer

    pos = np.concatenate(verts, axis=0).astype(np.float32)
    uv = np.concatenate(uvs, axis=0).astype(np.float32)
    morph = np.concatenate(morphs, axis=0).astype(np.float32)
    tri = np.concatenate(tris, axis=0).astype(np.int32)
    return pos, uv, morph, tri


def clipmap_vertex_heights(dem: np.ndarray, uv: np.ndarray,
                           morph: np.ndarray,
                           ring_resolution: int,
                           sampling: str = "bilinear") -> np.ndarray:
    """Geomorphed height per vertex (raw DEM units, before centering /
    exaggeration; skirt drop NOT applied). Mirrors vs_clipmap_main:
    fine sample at uv blended with a sample snapped to a 2^(ring+1)-texel
    coarse grid by the morph weight. `sampling` selects the height-texture
    filter: the recipe goldens bake the renderer's default NEAREST sampler
    (wgpu convention: texel floor(u * size)), while "bilinear" matches the
    shader's explicit filtered path."""
    h, w = dem.shape

    def nearest(u, v):
        xi = np.clip(np.floor(np.clip(u, 0.0, 1.0) * w).astype(int), 0, w - 1)
        yi = np.clip(np.floor(np.clip(v, 0.0, 1.0) * h).astype(int), 0, h - 1)
        return dem[yi, xi]

    def bilin(u, v):
        x = np.clip(u, 0.0, 1.0) * (w - 1)
        y = np.clip(v, 0.0, 1.0) * (h - 1)
        x0 = np.clip(np.floor(x).astype(int), 0, w - 1)
        y0 = np.clip(np.floor(y).astype(int), 0, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        y1 = np.minimum(y0 + 1, h - 1)
        fx = x - x0
        fy = y - y0
        return (dem[y0, x0] * (1 - fx) * (1 - fy) + dem[y0, x1] * fx * (1 - fy)
                + dem[y1, x0] * (1 - fx) * fy + dem[y1, x1] * fx * fy)

    if sampling == "nearest":
        bilin = nearest  # noqa: F811 — same call contract, snapped texels

    u, v = uv[:, 0].astype(np.float64), uv[:, 1].astype(np.float64)
    h_fine = bilin(u, v)
    ring = np.maximum(morph[:, 1], 0.0)
    coarse_texels = np.exp2(np.minimum(ring + 1.0, 16.0))
    step_u = coarse_texels / max(w - 1, 1)
    step_v = coarse_texels / max(h - 1, 1)
    cu = u / step_u
    cv = v / step_v
    bu = np.floor(cu) * step_u
    bv = np.floor(cv) * step_v
    tu = cu - np.floor(cu)
    tv = cv - np.floor(cv)
    h00 = bilin(bu, bv)
    h10 = bilin(bu + step_u, bv)
    h01 = bilin(bu, bv + step_v)
    h11 = bilin(bu + step_u, bv + step_v)
    h_coarse = (h00 * (1 - tu) * (1 - tv) + h10 * tu * (1 - tv)
                + h01 * (1 - tu) * tv + h11 * tu * tv)
    wgt = np.clip(morph[:, 0], 0.0, 1.0)
    return h_fine * (1 - wgt) + h_coarse * wgt

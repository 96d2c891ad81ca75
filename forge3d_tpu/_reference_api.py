# forge3d_tpu/_reference_api.py — the reference's flat native-function
# surface (SURVEY.md A.7: ~200 wrap_pyfunction! registrations in
# src/py_module/functions/*.rs) resolved onto this package's modules.
#
# The reference exposes everything as flat `forge3d.<name>` functions
# (often with a `_py` suffix); users migrating from it expect those
# spellings. Each entry maps a reference name to "module:attr"; a few
# thin wrappers adapt argument shapes where the reference's contract
# differs from our module-level API. Resolution is lazy (imported on
# first access through forge3d_tpu.__getattr__).

from __future__ import annotations

import importlib

# name -> "module path:attr" (relative to forge3d_tpu)
_TABLE = {
    # path tracing / render
    "_pt_render_gpu": "pt.megakernel:pt_render_gpu",
    "_pt_render_gpu_mesh": "pt.mesh_render:pt_render_gpu_mesh",
    "render_brdf_tile": "brdf:render_brdf_tile",
    "render_brdf_tile_overrides": "brdf:render_brdf_tile_overrides",
    "render_debug_pattern_frame": "brdf:render_debug_pattern_frame",
    # camera / math / geometry
    "camera_look_at": "camera:camera_look_at",
    "camera_perspective": "camera:camera_perspective",
    "camera_orthographic": "camera:camera_orthographic",
    "camera_view_proj": "camera:camera_view_proj",
    "camera_dof_params": "camera:camera_dof_params",
    "uv_planar_unwrap_py": "geometry:uv_planar_unwrap",
    "extrude_polygon_py": "geometry:extrude_polygon",
    "geometry_centroid": "geometry:geometry_centroid",
    "geometry_measure": "geometry:geometry_measure",
    "geometry_subdivide": "geometry:subdivide_mesh",
    "weld_mesh": "geometry:weld_mesh",
    "geometry_validate": "geometry:validate_mesh",
    "geometry_repair": "geometry:repair_mesh",
    "geometry_simplify": "geometry:simplify_mesh",
    # GIS raster
    "read_raster_py": "gis:read_raster",
    "read_raster_info_py": "gis:read_raster_info",
    "read_raster_mask_py": "gis:read_raster_mask",
    "read_raster_window_py": "gis:read_raster_window",
    "write_raster_py": "gis:write_raster",
    "read_cog_py": "gis.cog:read_cog",
    "read_gridded_dataset_py": "gis.dem:read_gridded_dataset",
    "reproject_raster_py": "gis.warp:reproject_raster",
    "resample_raster_py": "gis:resample_raster",
    "normalize_raster_py": "gis:normalize_raster",
    "classify_raster_py": "gis:classify_raster",
    "mask_raster_py": "gis:mask_raster",
    "apply_nodata_py": "gis:apply_nodata",
    "align_raster_grid_py": "gis.warp:align_raster_to",
    "align_raster_to_py": "gis.warp:align_raster_to",
    "raster_bounds_py": "gis:raster_bounds",
    "raster_crs_py": "gis:raster_crs",
    "raster_resolution_py": "gis:raster_resolution",
    "raster_transform_py": "gis:raster_transform",
    "window_from_bounds_py": "gis:window_from_bounds",
    "transform_from_origin_py": "gis:transform_from_origin",
    "rowcol_py": "gis:rowcol",
    "xy_py": "gis:xy",
    # GIS vector / CRS
    "read_vector_py": "gis.vector:read_vector",
    "reproject_vector_py": "gis.vector:reproject_vector",
    "clip_vector_py": "gis.vector:clip_vector",
    "dissolve_vector_py": "gis.vector:dissolve_vector",
    "intersect_geometries_py": "gis.vector:intersect_geometries",
    "union_geometries_py": "gis.vector:union_geometries",
    "difference_geometries_py": "gis.vector:difference_geometries",
    "intersection_geometries_py": "gis.vector:intersect_geometries",
    "buffer_geometry_py": "gis.vector:buffer_geometry",
    "geometry_mask_py": "gis.vector:geometry_mask",
    "parse_crs_py": "geo.crs:parse_crs",
    "inspect_crs_py": "geo.crs:inspect_crs",
    "create_crs_transformer_py": "geo.crs:create_crs_transformer",
    "estimate_local_utm_py": "geo.crs:estimate_local_utm",
    "web_mercator_bounds_py": "geo.crs:web_mercator_bounds",
    "slippy_tile_index_py": "geo.crs:slippy_tile_index",
    "geodesic_direct": "geo.geodesic:geodesic_direct",
    "geodesic_inverse": "geo.geodesic:geodesic_inverse",
    "geoid_undulation": "geo.geoid:geoid_undulation",
    "parse_osm_features_py": "gis.osm:parse_osm_features",
    "query_osm_features_py": "gis.osm:query_osm_features",
    "prepare_osm_scene_py": "gis.osm:prepare_osm_scene",
    "fetch_remote_geodata_py": "gis.osm:fetch_remote_geodata",
    "cache_geodata_py": "gis.osm:cache_geodata",
    "build_terrarium_dem_py": "gis.osm:build_terrarium_dem",
    "decode_terrarium_dem_py": "gis.osm:decode_terrarium_dem",
    "prepare_dem_py": "gis.dem:prepare_dem",
    # vector render
    "vector_render_oit_py": "vector:vector_render_oit",
    "vector_render_oit_edl_py": "vector:vector_render_oit_edl",
    "vector_render_oit_and_pick_py": "vector:vector_render_oit_and_pick",
    "vector_render_pick_map_py": "vector:vector_render_pick_map",
    # labels / text
    "bake_msdf_atlas_py": "labels.atlas:bake_msdf_atlas",
    "text_shape_py": "labels.shape:text_shape",
    "declutter_optimal_py": "labels.declutter:declutter_optimal",
    # codecs
    "decode_bc7_rgba8": "codec.bc:decode_bc7",
    "decode_bc5_rg8": "codec.bc:decode_bc5",
    "decode_pnts_py": "tiles3d:decode_pnts",
    "copc_read_node_points_py": "pointcloud:copc_read_node_points",
    "read_laz_points_info_py": "pointcloud:read_laz_points_info",
    "read_laz_point_attributes_py": "pointcloud:read_laz_point_attributes",
    # assurance
    "begin_render_execution_capture": "assurance.certificate:begin_render_capture",
    "render_execution_report": "assurance.certificate:render_execution_report",
    "sign_render_certificate_digest": "assurance.certificate:sign_render_certificate_digest",
    # astro
    "astro_body_position": "astro:astro_body_position",
    "astro_moon_phase": "astro:astro_moon_phase",
    "astro_sidereal_time": "astro:astro_sidereal_time",
    "astro_delta_t_seconds": "astro:astro_delta_t_seconds",
    "astro_refraction_arcminutes": "astro:astro_refraction_arcminutes",
    "astro_validation_metrics": "astro:astro_validation_metrics",
    "body_info": "astro:body_info",
    "sky_set_observation": "astro:sky_set_observation",
}


def resolve(name: str):
    """Resolve a reference API name; raises KeyError when unknown."""
    if name in _WRAPPERS:
        return _WRAPPERS[name]
    mod_attr = _TABLE[name]
    mod_path, attr = mod_attr.split(":")
    mod = importlib.import_module(f"forge3d_tpu.{mod_path}")
    return getattr(mod, attr)


def names():
    return sorted(set(_TABLE) | set(_WRAPPERS))


# -- thin adapters ----------------------------------------------------------

def geometry_type(mesh) -> str:
    """Reference geometry_type: classify a mesh payload."""
    import numpy as np

    v = np.asarray(mesh.vertices if hasattr(mesh, "vertices") else mesh)
    if v.ndim == 2 and v.shape[1] == 3:
        return "triangle_mesh" if getattr(mesh, "indices", None) is not None \
            else "point_set"
    return "unknown"


def assign_crs_py(info: dict, crs: str) -> dict:
    """Attach/replace the CRS tag of a raster-info mapping (the reference
    assigns without reprojection)."""
    out = dict(info)
    out["crs"] = str(crs)
    return out


def rasterize_vectors_py(rings, out_shape, *, transform=None,
                         all_touched: bool = False, fill=0, value=1):
    from .gis import rasterize_polygons

    return rasterize_polygons(rings, tuple(out_shape), transform=transform,
                              all_touched=all_touched, fill=fill,
                              value=value)


def rasterize_shaped_run_py(text, size: float = 16.0):
    """Rasterize shaped text to an alpha image (reference text raster)."""
    import numpy as np

    from .labels.render import draw_text_rgba
    from .labels.shape import text_shape

    run = text_shape(str(text), size=float(size))
    w = max(int(run.width) + 8, 1)
    h = int(size * 1.8) + 8
    img = np.zeros((h, w, 4), np.uint8)
    draw_text_rgba(img, run, 4.0, h - 4.0 - size * 0.35, size=float(size))
    return img[..., 3]


def _astro_night_golden_frame(width: int = 256, height: int = 192, *,
                              jd: float = 2460310.5, latitude: float = 46.8,
                              longitude: float = -121.7):
    from .astro import render_night_sky

    return render_night_sky(int(width), int(height), float(jd),
                            float(latitude), float(longitude))


def run_interactive_viewer_cli(argv=None) -> int:
    from .viewer.server import main

    return int(main(argv or []) or 0)


def ecef_to_wgs84(x: float, y: float, z: float):
    from .geo.crs import ecef_to_geodetic

    return ecef_to_geodetic(float(x), float(y), float(z))


def vector_render_polygons_fill_py(width: int, height: int, rings,
                                   color=(0.3, 0.6, 0.9, 1.0)):
    import numpy as np

    from .vector import VectorScene

    vs = VectorScene()
    vs.add_polygons(rings, color=tuple(color[:3]),
                    opacity=float(color[3]) if len(color) > 3 else 1.0)
    rgb, alpha, _ = vs.render(int(width), int(height))
    out = np.concatenate([rgb, alpha[..., None]], axis=-1)
    return (np.clip(out, 0, 1) * 255 + 0.5).astype(np.uint8)


def vector_coverage_primitives_py(width: int, height: int, primitives):
    """Analytic coverage of disc/segment primitives (LIMES surface)."""
    import numpy as np

    from .vector.coverage import disc_coverage, stroke_coverage

    acc = np.zeros((int(height), int(width)), np.float32)
    for prim in primitives:
        kind = prim.get("kind", "disc")
        if kind == "disc":
            cov = disc_coverage(int(width), int(height),
                                centers=np.asarray([prim["center"]]),
                                radii=np.asarray([prim["radius"]]))
        else:
            cov = stroke_coverage(int(width), int(height),
                                  np.asarray(prim["points"]),
                                  width_px=float(prim.get("width", 2.0)))
        acc = acc + np.asarray(cov) * (1.0 - acc)
    return acc


def bake_msdf_atlas_shaped_py(text, size: float = 32.0, **kw):
    from .labels.atlas import bake_msdf_atlas

    charset = "".join(sorted(set(str(text))))
    return bake_msdf_atlas(charset, **kw)




def finish_render_execution_capture(capture=None):
    from .assurance.certificate import current_capture

    cap = capture or current_capture()
    if cap is not None:
        cap.finish()
    return cap


def abort_render_execution_capture(capture=None):
    from .assurance.certificate import current_capture

    cap = capture or current_capture()
    if cap is not None:
        cap.abort()
    return cap


# module-level vector scene (the reference keeps a global vector store
# behind add_points/lines/polygons + clear_vectors)
_GLOBAL_VECTORS = None


def _global_vectors():
    global _GLOBAL_VECTORS
    if _GLOBAL_VECTORS is None:
        from .vector import VectorScene

        _GLOBAL_VECTORS = VectorScene()
    return _GLOBAL_VECTORS


def add_points_py(points, **kw):
    return _global_vectors().add_points(points, **kw)


def add_lines_py(polyline, **kw):
    return _global_vectors().add_lines(polyline, **kw)


def add_polygons_py(rings, **kw):
    return _global_vectors().add_polygons(rings, **kw)


def add_graph_py(nodes, edges, **kw):
    import numpy as np

    vs = _global_vectors()
    nodes = np.asarray(nodes, np.float64)
    out = []
    for a, b in edges:
        out.append(vs.add_lines(nodes[[int(a), int(b)]], **kw))
    return out


def clear_vectors_py():
    global _GLOBAL_VECTORS
    _GLOBAL_VECTORS = None


def vector_render_analytic_py(width: int, height: int):
    """Render the global vector store with the analytic coverage engine."""
    import numpy as np

    rgb, alpha, _ = _global_vectors().render(int(width), int(height))
    out = np.concatenate([rgb, alpha[..., None]], axis=-1)
    return (np.clip(out, 0, 1) * 255 + 0.5).astype(np.uint8)


_WRAPPERS = {
    "geometry_type": geometry_type,
    "assign_crs_py": assign_crs_py,
    "rasterize_vectors_py": rasterize_vectors_py,
    "rasterize_shaped_run_py": rasterize_shaped_run_py,
    "_astro_night_golden_frame": _astro_night_golden_frame,
    "run_interactive_viewer_cli": run_interactive_viewer_cli,
    "ecef_to_wgs84": ecef_to_wgs84,
    "vector_render_polygons_fill_py": vector_render_polygons_fill_py,
    "vector_coverage_primitives_py": vector_coverage_primitives_py,
    "bake_msdf_atlas_shaped_py": bake_msdf_atlas_shaped_py,
    "finish_render_execution_capture": finish_render_execution_capture,
    "abort_render_execution_capture": abort_render_execution_capture,
    "add_points_py": add_points_py,
    "add_lines_py": add_lines_py,
    "add_polygons_py": add_polygons_py,
    "add_graph_py": add_graph_py,
    "clear_vectors_py": clear_vectors_py,
    "vector_render_analytic_py": vector_render_analytic_py,
}

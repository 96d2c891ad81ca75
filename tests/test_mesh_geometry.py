# Tests: mesh I/O round-trips, geometry engine, buildings import, mesh PT.
# Mirrors the reference's test strategy (SURVEY §4): deterministic oracles
# + property checks, no hardware gating (CPU jax backend from conftest).

import json
import math

import numpy as np
import pytest

from forge3d_tpu.buildings import (Building, buildings_to_mesh,
                                   extrude_footprints, load_cityjson,
                                   parse_osm_buildings)
from forge3d_tpu.geometry import (extrude_polygon, geometry_centroid,
                                  geometry_measure, mesh_info, primitive_mesh,
                                  repair_mesh, simplify_mesh, subdivide_mesh,
                                  triangulate_polygon, uv_planar_unwrap,
                                  validate_mesh, weld_mesh)
from forge3d_tpu.io.mesh import (MeshData, load_gltf, load_mesh, save_mesh)


def _box():
    return primitive_mesh("box", size=(1.0, 2.0, 3.0))


# ---------------------------------------------------------------------------
# primitives


def test_primitive_box_measure():
    m = _box()
    meas = geometry_measure(m)
    assert meas["volume"] == pytest.approx(6.0, rel=1e-5)
    assert meas["surface_area"] == pytest.approx(2 * (1 * 2 + 2 * 3 + 1 * 3), rel=1e-5)
    info = mesh_info(weld_mesh(m))
    assert info["watertight"]
    assert info["euler_characteristic"] == 2  # sphere topology


def test_primitive_sphere_area_volume():
    m = primitive_mesh("sphere", radius=1.0, rings=64, segments=128)
    meas = geometry_measure(weld_mesh(m))
    assert meas["surface_area"] == pytest.approx(4 * math.pi, rel=2e-3)
    assert meas["volume"] == pytest.approx(4 / 3 * math.pi, rel=2e-3)


@pytest.mark.parametrize("kind", ["plane", "box", "sphere", "cylinder", "cone", "torus"])
def test_primitives_valid(kind):
    m = primitive_mesh(kind)
    assert m.triangle_count > 0
    issues = [i for i in validate_mesh(m) if not i.startswith("nonmanifold")]
    # seam-duplicated lathe/grid verts may be unused after cap merge; none
    # of the hard failures may appear
    assert not any(i.startswith(("index_out_of_range", "nonfinite",
                                 "degenerate")) for i in issues), issues


def test_cylinder_watertight_after_weld():
    m = weld_mesh(primitive_mesh("cylinder", radius=0.7, height=2.0, segments=48))
    m = repair_mesh(m)
    info = mesh_info(m)
    assert info["watertight"], info
    meas = geometry_measure(m)
    assert meas["volume"] == pytest.approx(math.pi * 0.49 * 2.0, rel=5e-3)


# ---------------------------------------------------------------------------
# triangulation + extrusion


def test_triangulate_square_area():
    poly = [(0, 0), (4, 0), (4, 4), (0, 4)]
    v, t = triangulate_polygon(np.asarray(poly, float))
    area = 0.0
    for a, b, c in t:
        area += 0.5 * abs((v[b, 0] - v[a, 0]) * (v[c, 1] - v[a, 1])
                          - (v[c, 0] - v[a, 0]) * (v[b, 1] - v[a, 1]))
    assert area == pytest.approx(16.0)


def test_triangulate_concave_with_hole():
    outer = [(0, 0), (10, 0), (10, 10), (5, 6), (0, 10)]  # concave notch
    hole = [(2, 2), (4, 2), (4, 4), (2, 4)]
    v, t = triangulate_polygon(np.asarray(outer, float), [np.asarray(hole, float)])
    area = 0.0
    for a, b, c in t:
        area += 0.5 * abs((v[b, 0] - v[a, 0]) * (v[c, 1] - v[a, 1])
                          - (v[c, 0] - v[a, 0]) * (v[b, 1] - v[a, 1]))
    outer_area = 100 - 0.5 * 10 * 4  # pentagon area = 80
    assert area == pytest.approx(outer_area - 4.0, rel=1e-6)


def test_extrude_polygon_volume():
    poly = [(0, 0), (3, 0), (3, 2), (0, 2)]
    m = extrude_polygon(poly, height=5.0)
    meas = geometry_measure(weld_mesh(m))
    assert abs(meas["volume"]) == pytest.approx(30.0, rel=1e-5)
    info = mesh_info(repair_mesh(weld_mesh(m)))
    assert info["watertight"]


def test_extrude_with_hole_volume():
    poly = [(0, 0), (4, 0), (4, 4), (0, 4)]
    hole = [(1, 1), (3, 1), (3, 3), (1, 3)]
    m = extrude_polygon(poly, height=2.0, holes=[hole])
    meas = geometry_measure(weld_mesh(m))
    assert abs(meas["volume"]) == pytest.approx((16 - 4) * 2.0, rel=1e-4)


# ---------------------------------------------------------------------------
# weld / simplify / subdivide / repair


def test_weld_merges_duplicates():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                  [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    f = np.array([[0, 1, 2], [3, 4, 5]], np.uint32)
    m = weld_mesh(MeshData(v, f))
    assert m.vertex_count == 4
    assert m.triangle_count == 2


def test_subdivide_quadruples():
    m = _box()
    s = subdivide_mesh(m, levels=2)
    assert s.triangle_count == m.triangle_count * 16
    # surface unchanged for linear midpoint subdivision
    assert geometry_measure(s)["surface_area"] == pytest.approx(
        geometry_measure(m)["surface_area"], rel=1e-5)


def test_subdivide_smooth_shrinks_box():
    m = weld_mesh(_box())
    s = subdivide_mesh(m, levels=2, smooth=True)
    assert geometry_measure(s)["surface_area"] < geometry_measure(m)["surface_area"]


def test_simplify_reduces():
    m = primitive_mesh("sphere", rings=32, segments=64)
    s = simplify_mesh(weld_mesh(m), target_ratio=0.2)
    assert 0 < s.triangle_count < 0.6 * m.triangle_count
    # stays roughly spherical
    r = np.linalg.norm(s.vertices, axis=1)
    assert np.all(r < 0.6) and np.all(r > 0.3)


def test_repair_drops_degenerate():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [np.nan, 0, 0]], np.float32)
    f = np.array([[0, 1, 2], [0, 1, 1], [0, 1, 3]], np.uint32)
    m = repair_mesh(MeshData(v, f))
    assert m.triangle_count == 1
    assert validate_mesh(m) == [] or all(
        i.startswith("nonmanifold") or i.startswith("unused") for i in validate_mesh(m))


def test_centroid_and_unwrap():
    m = _box()
    c = geometry_centroid(m)
    assert np.allclose(c, 0.0, atol=1e-6)
    uv = uv_planar_unwrap(m, axis="y")
    assert uv.shape == (m.vertex_count, 2)
    assert uv.min() >= 0 and uv.max() <= 1


# ---------------------------------------------------------------------------
# mesh file I/O round-trips


@pytest.mark.parametrize("ext", ["obj", "ply", "stl"])
def test_mesh_roundtrip(tmp_path, ext):
    m = weld_mesh(primitive_mesh("torus", rings=8, segments=12))
    m.compute_normals()
    p = tmp_path / f"mesh.{ext}"
    save_mesh(p, m)
    r = load_mesh(p)
    assert r.triangle_count == m.triangle_count
    if ext == "stl":  # stl deduplicates nothing; weld to compare
        r = weld_mesh(r)
        m2 = weld_mesh(m)
        assert r.vertex_count == m2.vertex_count
    else:
        np.testing.assert_allclose(
            np.sort(r.vertices.ravel()), np.sort(m.vertices.ravel()), atol=1e-5)


def test_ply_ascii_roundtrip(tmp_path):
    from forge3d_tpu.io.mesh import load_ply, save_ply
    m = primitive_mesh("box")
    p = tmp_path / "m.ply"
    save_ply(p, m, binary=False)
    r = load_ply(p)
    assert r.triangle_count == m.triangle_count
    np.testing.assert_allclose(r.vertices, m.vertices, atol=1e-5)


def test_obj_with_uv_normals(tmp_path):
    m = primitive_mesh("plane", resolution=(2, 2))
    p = tmp_path / "m.obj"
    save_mesh(p, m)
    r = load_mesh(p)
    assert r.uvs is not None and r.normals is not None
    np.testing.assert_allclose(r.normals, m.normals, atol=1e-5)


def test_gltf_embedded(tmp_path):
    import base64
    # minimal triangle gltf with embedded base64 buffer
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], "<f4")
    idx = np.array([0, 1, 2], "<u2")
    buf = pos.tobytes() + idx.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [1.0, 2.0, 3.0]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3, "type": "SCALAR"}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6}],
        "buffers": [{"byteLength": len(buf),
                     "uri": "data:application/octet-stream;base64,"
                            + base64.b64encode(buf).decode()}],
    }
    p = tmp_path / "tri.gltf"
    p.write_text(json.dumps(gltf))
    meshes = load_gltf(p)
    assert len(meshes) == 1
    np.testing.assert_allclose(meshes[0].vertices,
                               pos + np.array([1, 2, 3], np.float32), atol=1e-6)


def test_glb_roundtrip(tmp_path):
    import struct
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], "<f4")
    gltf = {
        "asset": {"version": "2.0"},
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
        "accessors": [{"bufferView": 0, "componentType": 5126, "count": 3,
                       "type": "VEC3"}],
        "bufferViews": [{"buffer": 0, "byteOffset": 0, "byteLength": 36}],
        "buffers": [{"byteLength": 36}],
    }
    js = json.dumps(gltf).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    bin_chunk = pos.tobytes()
    total = 12 + 8 + len(js) + 8 + len(bin_chunk)
    raw = (struct.pack("<III", 0x46546C67, 2, total)
           + struct.pack("<II", len(js), 0x4E4F534A) + js
           + struct.pack("<II", len(bin_chunk), 0x004E4942) + bin_chunk)
    p = tmp_path / "tri.glb"
    p.write_bytes(raw)
    meshes = load_gltf(p)
    np.testing.assert_allclose(meshes[0].vertices, pos, atol=1e-6)


# ---------------------------------------------------------------------------
# buildings


def test_extrude_footprints_batch():
    fps = [[(0, 0), (1, 0), (1, 1), (0, 1)],
           [(2, 0), (3, 0), (3, 1), (2, 1)]]
    m = extrude_footprints(fps, [2.0, 4.0])
    meas = geometry_measure(weld_mesh(m))
    assert abs(meas["volume"]) == pytest.approx(2.0 + 4.0, rel=1e-4)


def test_cityjson_lod1():
    cj = {
        "type": "CityJSON", "version": "2.0",
        "transform": {"scale": [0.001, 0.001, 0.001], "translate": [0, 0, 0]},
        "CityObjects": {
            "b1": {"type": "Building", "attributes": {"height": 10},
                   "geometry": [{"type": "Solid", "lod": "1",
                                 "boundaries": [[
                                     [[0, 1, 2, 3]],       # bottom
                                     [[4, 7, 6, 5]],       # top
                                     [[0, 4, 5, 1]], [[1, 5, 6, 2]],
                                     [[2, 6, 7, 3]], [[3, 7, 4, 0]]]]}]}},
        "vertices": [[0, 0, 0], [10000, 0, 0], [10000, 10000, 0], [0, 10000, 0],
                     [0, 0, 5000], [10000, 0, 5000], [10000, 10000, 5000],
                     [0, 10000, 5000]],
    }
    meshes = load_cityjson(cj)
    assert len(meshes) == 1
    meas = geometry_measure(meshes[0])
    assert abs(meas["volume"]) == pytest.approx(10 * 10 * 5, rel=1e-5)
    assert meshes[0].materials["attributes"]["height"] == 10


def test_osm_buildings_parse():
    gj = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "id": "w1",
         "properties": {"building": "yes", "height": "12.5"},
         "geometry": {"type": "Polygon", "coordinates": [[
             [0.0, 0.0], [0.001, 0.0], [0.001, 0.001], [0.0, 0.001], [0.0, 0.0]]]}},
        {"type": "Feature", "id": "w2",
         "properties": {"building": "yes", "building:levels": "4"},
         "geometry": {"type": "Polygon", "coordinates": [[
             [0.002, 0.0], [0.003, 0.0], [0.003, 0.001], [0.002, 0.001],
             [0.002, 0.0]]]}},
        {"type": "Feature", "properties": {"highway": "residential"},
         "geometry": {"type": "LineString", "coordinates": [[0, 0], [1, 1]]}},
    ]}
    bs = parse_osm_buildings(gj, origin=(0.0, 0.0))
    assert len(bs) == 2
    assert bs[0].height == pytest.approx(12.5)
    assert bs[1].height == pytest.approx(12.0)  # 4 levels * 3 m
    m = buildings_to_mesh(bs)
    assert m.triangle_count > 0
    # footprint ~111m x ~110m in local meters
    w = bs[0].footprint[:, 0].max() - bs[0].footprint[:, 0].min()
    assert 100 < w < 120


# ---------------------------------------------------------------------------
# mesh path tracing


def test_pt_render_gpu_mesh_hits_box():
    from forge3d_tpu.pt.mesh_render import pt_render_gpu_mesh
    m = weld_mesh(primitive_mesh("box"))
    out = pt_render_gpu_mesh(
        64, 48, m.vertices, m.indices,
        {"origin": (0, 0.8, 2.5), "look_at": (0, 0, 0)},
        aovs=("depth", "visibility", "normal"))
    assert out["rgba"].shape == (48, 64, 4)
    vis = out["visibility"]
    assert 0.05 < vis.mean() < 0.9         # box covers part of the frame
    center = vis[24, 32]
    assert center == 1.0                    # center pixel hits the box
    assert out["depth"][24, 32] < 3.0
    # normal at center faces the camera (+z)
    assert out["normal"][24, 32, 2] > 0.9


def test_pt_mesh_shadow():
    from forge3d_tpu.pt.mesh_render import pt_render_gpu_mesh
    # plane + floating box above: box shadow must darken the plane under sun
    plane = primitive_mesh("plane", size=(10, 10), resolution=(1, 1))
    box = primitive_mesh("box")
    box.vertices[:, 1] += 1.5
    from forge3d_tpu.io.mesh import merge_meshes
    scene = merge_meshes([plane, box])
    out = pt_render_gpu_mesh(
        96, 96, scene.vertices, scene.indices,
        {"origin": (0, 6.0, 6.0), "look_at": (0, 0, 0)},
        sun={"azimuth": 0.0, "elevation": 90.0, "intensity": 5.0},
        aovs=("direct",))
    direct = out["direct"]
    lum = direct.sum(-1)
    # pixels under the box (image center-ish) receive less direct light than
    # open-plane pixels
    shadow_region = lum[40:56, 40:56].mean()
    open_region = lum[70:90, 4:24].mean()
    assert shadow_region < 0.5 * open_region


def test_pt_mesh_matches_bruteforce_depth():
    from forge3d_tpu.ops.bvh import trace_mesh_bruteforce_numpy
    from forge3d_tpu.pt.mesh_render import MeshTracerScene, pt_render_gpu_mesh
    rng = np.random.default_rng(3)
    # random triangle soup
    v = rng.uniform(-1, 1, (60, 3)).astype(np.float32)
    f = np.arange(60, dtype=np.uint32).reshape(-1, 3)
    out = pt_render_gpu_mesh(32, 32, v, f,
                             {"origin": (0, 0, 3), "look_at": (0, 0, 0)},
                             aovs=("depth", "visibility"))
    # oracle on a few pixels
    scn = MeshTracerScene(v, f)
    import jax.numpy as jnp  # noqa: F401
    for (px, py) in [(16, 16), (8, 24), (25, 5)]:
        ndc_x = 2 * (px + 0.5) / 32 - 1
        ndc_y = 1 - 2 * (py + 0.5) / 32
        import math as _m
        th = _m.tan(_m.radians(45.0) / 2)
        d = np.array([ndc_x * th, ndc_y * th, -1.0])
        d /= np.linalg.norm(d)
        hit_ref, t_ref = trace_mesh_bruteforce_numpy(
            v, f, np.array([0, 0, 3.0]), d)
        hit_ref, t_ref = bool(hit_ref[0]), float(t_ref[0])
        got_vis = out["visibility"][py, px]
        assert bool(hit_ref) == bool(got_vis), (px, py)
        if hit_ref:
            assert out["depth"][py, px] == pytest.approx(t_ref, rel=1e-3)


def test_load_citygml_lod2_building():
    """CityGML 2.0 XML import: a gml box building parses into a welded,
    triangulated mesh; empty documents fail closed."""
    from forge3d_tpu.buildings import load_citygml

    def ring(pts):
        flat = " ".join(f"{x} {y} {z}" for x, y, z in pts + [pts[0]])
        return ("<gml:Polygon><gml:exterior><gml:LinearRing>"
                f"<gml:posList srsDimension=\"3\">{flat}</gml:posList>"
                "</gml:LinearRing></gml:exterior></gml:Polygon>")

    # a unit box: floor, roof, 4 walls
    surfaces = "".join([
        ring([(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]),
        ring([(0, 0, 2), (0, 1, 2), (1, 1, 2), (1, 0, 2)]),
        ring([(0, 0, 0), (0, 0, 2), (1, 0, 2), (1, 0, 0)]),
        ring([(1, 0, 0), (1, 0, 2), (1, 1, 2), (1, 1, 0)]),
        ring([(1, 1, 0), (1, 1, 2), (0, 1, 2), (0, 1, 0)]),
        ring([(0, 1, 0), (0, 1, 2), (0, 0, 2), (0, 0, 0)]),
    ])
    doc = (
        '<core:CityModel xmlns:core="http://www.opengis.net/citygml/2.0" '
        'xmlns:bldg="http://www.opengis.net/citygml/building/2.0" '
        'xmlns:gml="http://www.opengis.net/gml">'
        "<core:cityObjectMember>"
        '<bldg:Building gml:id="B1"><bldg:lod2Solid><gml:Solid>'
        "<gml:exterior><gml:CompositeSurface>"
        + "".join(f"<gml:surfaceMember>{s}</gml:surfaceMember>"
                  for s in [surfaces]) +
        "</gml:CompositeSurface></gml:exterior>"
        "</gml:Solid></bldg:lod2Solid></bldg:Building>"
        "</core:cityObjectMember></core:CityModel>"
    )
    meshes = load_citygml(doc)
    assert len(meshes) == 1
    m = meshes[0]
    assert m.name == "B1"
    assert len(m.vertices) == 8          # welded box corners
    assert len(m.indices) == 12          # 6 quads fan-split
    assert m.vertices[:, 2].min() == 0.0 and m.vertices[:, 2].max() == 2.0

    import pytest as _pytest
    with _pytest.raises(ValueError):
        load_citygml("<core:CityModel "
                     "xmlns:core=\"http://www.opengis.net/citygml/2.0\"/>")


def test_read_image_jpeg_and_png(tmp_path):
    """External image import seam: PNG through the first-party reader,
    JPEG through Pillow (fail-closed without it)."""
    from forge3d_tpu.io.formats import read_image, write_jpeg
    from forge3d_tpu.io.image import numpy_to_png

    g = (np.mgrid[0:16, 0:24][0] * 12).astype(np.uint8)
    rgb = np.stack([g, 255 - g, g // 2], -1)
    jp = tmp_path / "t.jpg"
    write_jpeg(jp, rgb)
    back = read_image(jp)
    assert back.shape == (16, 24, 4)
    assert np.abs(back[..., :3].astype(int) - rgb.astype(int)).mean() < 3.0
    pp = tmp_path / "t.png"
    numpy_to_png(pp, np.concatenate(
        [rgb, np.full((16, 24, 1), 255, np.uint8)], -1))
    back2 = read_image(pp)
    assert np.array_equal(back2[..., :3], rgb)


class TestTlas:
    """Two-level instancing (ops/tlas.py): transformed instances over a
    shared BLAS match the equivalent merged mesh, and t stays world-scaled
    under non-uniform transforms."""

    def _box(self):
        from forge3d_tpu.geometry import primitive_mesh

        m = primitive_mesh("box")
        return np.asarray(m.vertices, np.float32), np.asarray(
            m.indices, np.uint32)

    def test_instances_match_merged_mesh(self):
        from forge3d_tpu.ops.bvh import (build_sah_bvh, mesh_scene,
                                         trace_mesh)
        from forge3d_tpu.ops.tlas import Instance, build_tlas, trace_tlas
        from forge3d_tpu.transforms import rotate_y, scale, translate

        v, f = self._box()
        t_a = translate(-2.0, 0.0, 0.0) @ rotate_y(30.0)
        t_b = translate(2.5, 0.5, 0.0) @ scale(1.5, 0.7, 1.0)
        tlas = build_tlas([(v, f)], [Instance(0, t_a), Instance(0, t_b)])

        # merged reference: bake both transforms into one mesh
        def xf(m, verts):
            return (verts @ m[:3, :3].T + m[:3, 3]).astype(np.float32)

        mv = np.concatenate([xf(t_a, v), xf(t_b, v)])
        mf = np.concatenate([f, f + len(v)]).astype(np.uint32)
        bvh = build_sah_bvh(mv, mf)
        scene, n_nodes = mesh_scene(bvh)

        n = 48
        ys, xs = np.mgrid[0:n, 0:n].astype(np.float32)
        ro = (xs / n * 10 - 5, np.full((n, n), 0.2, np.float32),
              np.full((n, n), 8.0, np.float32))
        rd = (np.zeros((n, n), np.float32), np.zeros((n, n), np.float32),
              np.full((n, n), -1.0, np.float32))
        ht = trace_tlas(tlas, ro, rd)
        hm = trace_mesh(scene, n_nodes, ro, rd)
        assert np.array_equal(np.asarray(ht.hit), np.asarray(hm.hit))
        both = np.asarray(ht.hit)
        assert both.sum() > 20
        np.testing.assert_allclose(np.asarray(ht.t)[both],
                                   np.asarray(hm.t)[both], rtol=1e-4)
        # instances attributed correctly: left hits instance 0, right 1
        inst = np.asarray(ht.instance)
        xs_hit = np.asarray(ro[0])[both]
        assert (inst[both][xs_hit < 0] == 0).all()
        assert (inst[both][xs_hit > 1.0] == 1).all()

    def test_instance_normals_world_space(self):
        from forge3d_tpu.ops.tlas import (Instance, build_tlas,
                                          instance_normal, trace_tlas)
        from forge3d_tpu.transforms import scale

        v, f = self._box()
        # non-uniform scale: normals need the inverse-transpose
        tlas = build_tlas([(v, f)], [Instance(0, scale(4.0, 1.0, 1.0))])
        ro = (np.float32(0.0), np.float32(0.0), np.float32(8.0))
        rd = (np.float32(0.0), np.float32(0.0), np.float32(-1.0))
        h = trace_tlas(tlas, ro, rd)
        assert bool(h.hit)
        # the +z face's object normal stays +z in world space, unit length
        wx, wy, wz = instance_normal(tlas, h, (0.0, 0.0, 1.0))
        assert abs(float(wz) - 1.0) < 1e-6
        assert abs(float(wx)) < 1e-6

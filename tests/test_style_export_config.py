# Tests: Mapbox style import + expressions, SVG/PDF export, camera rigs,
# config/presets.

import json
import zlib

import numpy as np
import pytest

from forge3d_tpu.style import (MapStyle, StyleError, evaluate_expression,
                               load_style, parse_color)


# ---------------------------------------------------------------------------
# style


def test_parse_colors():
    assert parse_color("#ff0000") == (1.0, 0.0, 0.0, 1.0)
    assert parse_color("#f00") == (1.0, 0.0, 0.0, 1.0)
    r, g, b, a = parse_color("#00ff0080")
    assert (r, g, b) == (0.0, 1.0, 0.0) and a == pytest.approx(128 / 255)
    assert parse_color("rgba(255, 0, 0, 0.5)") == (1.0, 0.0, 0.0, 0.5)
    hr, hg, hb, _ = parse_color("hsl(120, 100%, 50%)")
    assert (hr, hg, hb) == pytest.approx((0.0, 1.0, 0.0))
    assert parse_color("white")[:3] == (1.0, 1.0, 1.0)
    with pytest.raises(StyleError):
        parse_color("#zz")


def test_expressions():
    props = {"class": "river", "width": 3}
    assert evaluate_expression(["get", "class"], props) == "river"
    assert evaluate_expression(["==", ["get", "class"], "river"], props)
    assert evaluate_expression(
        ["case", ["==", ["get", "class"], "river"], 10, 2], props) == 10
    assert evaluate_expression(
        ["match", ["get", "class"], ["river", "lake"], "blue", "gray"],
        props) == "blue"
    assert evaluate_expression(["*", ["get", "width"], 2], props) == 6
    # interpolate on zoom
    v = evaluate_expression(
        ["interpolate", ["linear"], ["zoom"], 5, 1.0, 10, 11.0],
        props, zoom=7.5)
    assert v == pytest.approx(6.0)
    # step
    assert evaluate_expression(["step", ["zoom"], 1, 10, 4], zoom=12) == 4
    # legacy stops
    assert evaluate_expression({"stops": [[0, 2.0], [10, 12.0]]},
                               zoom=5) == pytest.approx(7.0)


def test_load_style_and_filter():
    doc = {
        "version": 8, "name": "demo",
        "sources": {"base": {"type": "vector"}},
        "layers": [
            {"id": "bg", "type": "background",
             "paint": {"background-color": "#222222"}},
            {"id": "water", "type": "fill", "source": "base",
             "filter": ["==", ["get", "class"], "water"],
             "paint": {"fill-color": "rgba(30, 90, 180, 0.9)"}},
            {"id": "roads", "type": "line", "source": "base", "minzoom": 8,
             "paint": {"line-width": ["interpolate", ["linear"], ["zoom"],
                                      8, 1, 14, 6],
                       "line-color": "#ffffff"}},
            {"id": "hillshade", "type": "hillshade"},  # skipped
        ],
    }
    style = load_style(doc)
    assert isinstance(style, MapStyle)
    assert [lyr.id for lyr in style.layers] == ["bg", "water", "roads"]
    water = style.layers[1]
    assert water.matches({"class": "water"})
    assert not water.matches({"class": "park"})
    c = water.paint_value("fill-color", {"class": "water"})
    assert c[2] == pytest.approx(180 / 255)
    roads = style.layers[2]
    assert not roads.matches({}, zoom=5)      # below minzoom
    assert roads.paint_value("line-width", {}, zoom=11) == pytest.approx(3.5)


# ---------------------------------------------------------------------------
# export


def _doc():
    from forge3d_tpu.export import VectorDocument

    d = VectorDocument(400, 300, background=(1, 1, 1, 1))
    d.add_polygon([(50, 50), (350, 50), (350, 250), (50, 250)],
                  holes=[[(150, 100), (250, 100), (250, 200), (150, 200)]],
                  fill=(0.2, 0.5, 0.8, 0.6), stroke=(0, 0, 0, 1))
    d.add_polyline([(10, 290), (200, 150), (390, 290)],
                   color=(0.8, 0.1, 0.1, 1), width=2.5, dash=[4, 2])
    d.add_marker(200, 150, radius=5, color=(0, 0, 0, 1))
    d.add_text("Summit (2 km)", 205, 145, size=14, anchor="start")
    return d


def test_export_svg(tmp_path):
    from forge3d_tpu.export import export_svg

    p = tmp_path / "map.svg"
    export_svg(_doc(), p)
    svg = p.read_text()
    assert svg.startswith("<svg")
    assert "<polyline" in svg and "<path" in svg and "<circle" in svg
    assert "Summit (2 km)" in svg
    assert 'fill-rule="evenodd"' in svg        # holes honored
    assert "stroke-dasharray" in svg


def test_export_pdf(tmp_path):
    from forge3d_tpu.export import export_pdf

    p = tmp_path / "map.pdf"
    export_pdf(_doc(), p)
    raw = p.read_bytes()
    assert raw.startswith(b"%PDF-1.4")
    assert raw.rstrip().endswith(b"%%EOF")
    # content stream decompresses and contains path + text operators
    start = raw.index(b"stream\n") + 7
    end = raw.index(b"\nendstream")
    content = zlib.decompress(raw[start:end]).decode("latin-1")
    assert " re f" in content or " m " in content
    assert "Tj" in content and "Summit" in content
    # xref offsets point at object headers
    xref_off = int(raw.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    assert raw[xref_off:xref_off + 4] == b"xref"


def test_export_validation():
    from forge3d_tpu.export import VectorDocument

    d = VectorDocument(100, 100)
    with pytest.raises(ValueError):
        d.add_polyline([(0, 0)])
    with pytest.raises(ValueError):
        d.add_text("x", 0, 0, anchor="top")


# ---------------------------------------------------------------------------
# camera rigs


def test_orbit_rig():
    from forge3d_tpu.camera_rigs import OrbitRig

    rig = OrbitRig(target=(10, 0, 10), radius=50, theta_deg=30)
    frames = rig.frames(8)
    assert len(frames) == 8
    for f in frames:
        d = np.linalg.norm(np.subtract(f.origin, f.look_at))
        assert d == pytest.approx(50, rel=1e-6)
    # a full sweep returns to the start
    assert frames[0].origin == pytest.approx(frames[-1].origin, abs=1e-6)


def test_flythrough_rig():
    from forge3d_tpu.camera_rigs import FlythroughRig

    rig = FlythroughRig(waypoints=[(0, 10, 0), (50, 20, 0), (100, 10, 50)])
    frames = rig.frames(16)
    # passes near the waypoints in order
    xs = [f.origin[0] for f in frames]
    assert xs[0] == pytest.approx(0, abs=1e-6)
    assert xs[-1] == pytest.approx(100, abs=1e-6)
    assert all(b >= a - 5 for a, b in zip(xs, xs[1:]))  # mostly forward
    # look_at leads the position
    assert frames[3].look_at[0] > frames[3].origin[0]


def test_dolly_and_spiral_and_presets():
    from forge3d_tpu.camera_rigs import (DollyRig, SpiralRig, rig_from_preset)

    d = DollyRig(start=(100, 50, 100), end=(20, 10, 20), look_at=(0, 0, 0),
                 fov_start_deg=45, fov_end_deg=70)
    f0, f1 = d.frame(0.0), d.frame(1.0)
    assert f0.fov_y_deg == 45 and f1.fov_y_deg == 70
    assert np.linalg.norm(f1.origin) < np.linalg.norm(f0.origin)

    s = SpiralRig(target=(0, 0, 0), radius_start=100, radius_end=40)
    assert np.linalg.norm(s.frame(1.0).origin) < np.linalg.norm(s.frame(0.0).origin)

    rig = rig_from_preset("orbit_reveal", target=(5, 0, 5), radius=80)
    assert rig.frame(0.5).fov_y_deg == 45.0
    with pytest.raises(KeyError):
        rig_from_preset("warp", target=(0, 0, 0))


# ---------------------------------------------------------------------------
# config


def test_config_presets_and_merge(tmp_path, monkeypatch):
    from forge3d_tpu.config import (RendererConfig, list_presets,
                                    load_renderer_config, merge_config)

    assert "production" in list_presets()
    cfg = load_renderer_config(preset="draft")
    assert cfg.spp == 4 and cfg.denoise == "atrous"

    # file overrides preset; explicit overrides override file; env between
    p = tmp_path / "render.json"
    p.write_text(json.dumps({"preset": "production", "width": 640,
                             "custom_key": 42}))
    monkeypatch.setenv("FORGE3D_SPP", "32")
    cfg2 = load_renderer_config(str(p), overrides={"height": 360})
    assert cfg2.width == 640
    assert cfg2.height == 360
    assert cfg2.spp == 32                       # env beat the file
    assert cfg2.extras["custom_key"] == 42

    with pytest.raises(ValueError):
        merge_config(RendererConfig(), {"tonemap": "instagram"})
    with pytest.raises(ValueError):
        merge_config(RendererConfig(), {"spp": -1})


def test_style_expression_math_string_color_ops():
    """Extended Mapbox GL ops (reference style_expressions.py:176-705)."""
    from forge3d_tpu.style import evaluate_expression as ev

    assert ev(["at", 1, ["literal", [10, 20, 30]]]) == 20
    assert ev(["length", ["literal", "abc"]]) == 3
    assert ev(["typeof", ["literal", "x"]]) == "string"
    assert ev(["typeof", 3.5]) == "number"
    assert ev(["to-boolean", ""]) is False
    assert ev(["abs", -4]) == 4.0
    assert ev(["ceil", 1.2]) == 2.0
    assert ev(["floor", 1.8]) == 1.0
    assert ev(["round", 2.5]) == 3.0
    assert abs(ev(["sqrt", 9]) - 3.0) < 1e-12
    assert abs(ev(["ln", ["e"]]) - 1.0) < 1e-12
    assert ev(["log2", 8]) == 3.0
    assert abs(ev(["sin", 0]) - 0.0) < 1e-12
    assert ev(["min", 3, 1, 2]) == 1.0
    assert ev(["max", 3, 1, 2]) == 3.0
    assert abs(ev(["pi"]) - 3.14159265) < 1e-6
    assert ev(["downcase", ["literal", "ABC"]]) == "abc"
    assert ev(["upcase", ["literal", "abc"]]) == "ABC"
    rgba = ev(["rgba", 255, 0, 127.5, 0.5])
    assert rgba == (1.0, 0.0, 0.5, 0.5)
    assert ev(["rgb", 0, 255, 0]) == (0.0, 1.0, 0.0, 1.0)
    # nested through match/case still evaluates
    assert ev(["case", [">", ["abs", -5], 4], ["upcase",
               ["literal", "hi"]], "no"]) == "HI"

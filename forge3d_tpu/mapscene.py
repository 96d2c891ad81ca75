# forge3d_tpu/mapscene.py
# MapScene: the declarative scene compiler — recipe in, finished map out.
#
# Parity notes (reference behavior, not code):
#   /root/reference/python/forge3d/map_scene.py (6.1k) and
#   _map_scene_{validation,labels,render,common}.py — SceneRecipe
#   (TerrainSource, OrbitCamera, LightingPreset, layers, OutputSpec) →
#   validation (may BLOCK the render) → compiled plan → native terrain
#   render → vector/raster overlay compositing → furniture → deterministic
#   PNG; `cache=`/`certificate=` kwargs on render.
#
# The TPU build compiles the recipe onto TerrainRenderer (one fused device
# program) and composites overlays/furniture host-side; overlay vertices are
# projected with the same camera the renderer uses, so overlays register
# exactly with the terrain image.

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .camera import camera_basis, orbit_camera_origin
from .diagnostics import Severity, ValidationReport
from .errors import RenderError, UploadError
from .frame import Frame
from .terrain.params import (
    FogSettings,
    LightSettings,
    TerrainRenderParams,
    WaterSettings,
    make_terrain_params,
)


# ---------------------------------------------------------------------------
# Recipe elements
# ---------------------------------------------------------------------------

@dataclass
class TerrainSource:
    dem: Optional[np.ndarray] = None
    path: Optional[str] = None       # GeoTIFF path
    band: int = 0
    crs: Optional[str] = None
    spacing: Optional[Tuple[float, float]] = None
    z_scale: float = 1.0
    nodata_fill: Optional[float] = None

    def resolve(self) -> Tuple[np.ndarray, Tuple[float, float], Optional[str]]:
        if (self.dem is None) == (self.path is None):
            raise UploadError("TerrainSource needs exactly one of dem/path")
        if self.path is not None:
            from . import gis

            info = gis.read_raster_info(self.path)
            dem = np.asarray(gis.read_raster(self.path, band=self.band), np.float32)
            spacing = self.spacing or info["resolution"]
            crs = self.crs or info["crs"]
            if info["nodata"] is not None:
                fill = (self.nodata_fill if self.nodata_fill is not None
                        else float(np.nanmin(np.where(dem == info["nodata"], np.nan, dem))))
                dem = np.where(dem == info["nodata"], fill, dem)
        else:
            dem = np.asarray(self.dem, np.float32)
            if self.nodata_fill is not None:
                dem = np.where(np.isfinite(dem), dem, self.nodata_fill)
            spacing = self.spacing or (1.0, 1.0)
            crs = self.crs
        return dem, (float(spacing[0]), float(spacing[1])), crs


@dataclass
class OrbitCamera:
    target: Optional[Tuple[float, float, float]] = None  # None = DEM center
    radius: float = 0.0          # 0 = auto (1.2 x span)
    phi_deg: float = 225.0
    theta_deg: float = 35.0
    fov_y_deg: float = 45.0


_LIGHTING_PRESETS = {
    "noon": LightSettings(azimuth_deg=180.0, elevation_deg=65.0, intensity=2.6,
                          ambient=0.22),
    "golden_hour": LightSettings(azimuth_deg=260.0, elevation_deg=12.0,
                                 intensity=2.2, color=(1.0, 0.82, 0.6),
                                 ambient=0.18,
                                 ambient_color=(0.45, 0.5, 0.7)),
    "overcast": LightSettings(azimuth_deg=315.0, elevation_deg=50.0,
                              intensity=0.9, color=(0.95, 0.97, 1.0),
                              ambient=0.55,
                              ambient_color=(0.75, 0.78, 0.82)),
    "default": LightSettings(),
}


def lighting_preset(name: str) -> LightSettings:
    try:
        return _LIGHTING_PRESETS[name]
    except KeyError:
        raise ValueError(
            f"unknown lighting preset {name!r}; have {sorted(_LIGHTING_PRESETS)}")


@dataclass
class VectorOverlayLayer:
    kind: str                       # points|lines|polygons
    coordinates: object             # world xz coords: (N,2) or rings list
    color: Tuple[float, float, float] = (0.9, 0.2, 0.1)
    width: float = 3.0              # stroke px / point size px
    opacity: float = 1.0
    height_offset: float = 1.0      # meters above terrain
    name: str = ""


@dataclass
class RasterOverlayLayer:
    image: np.ndarray               # (H, W, 3|4) float or uint8
    opacity: float = 1.0
    name: str = ""


@dataclass
class MapFurniture:
    legend: bool = False
    legend_label: str = "elevation"
    scale_bar: bool = False
    north_arrow: bool = False
    title: str = ""
    subtitle: str = ""
    graticule_spacing: float = 0.0  # 0 = off (world units)


@dataclass
class OutputSpec:
    size_px: Tuple[int, int] = (800, 600)
    samples: int = 1
    aovs: Tuple[str, ...] = ()
    bit_depth: int = 8
    format: str = "png"


@dataclass
class SceneRecipe:
    terrain: TerrainSource = None
    camera: OrbitCamera = field(default_factory=OrbitCamera)
    lighting: object = "default"       # preset name or LightSettings
    colormap: str = "terrain"
    water_level: Optional[float] = None
    fog_density: float = 0.0
    layers: List = field(default_factory=list)
    furniture: MapFurniture = field(default_factory=MapFurniture)
    output: OutputSpec = field(default_factory=OutputSpec)
    name: str = "map"


# ---------------------------------------------------------------------------
# MapScene
# ---------------------------------------------------------------------------

class MapScene:
    """Compile and render a SceneRecipe."""

    def __init__(self, recipe: SceneRecipe = None, **kwargs):
        if recipe is None:
            recipe = SceneRecipe(**kwargs)
        self.recipe = recipe
        self._plan = None
        self.last_validation: Optional[ValidationReport] = None

    # -- validation --------------------------------------------------------
    def validate(self) -> ValidationReport:
        r = self.recipe
        rep = ValidationReport()
        if r.terrain is None:
            rep.fatal("terrain.missing", "recipe has no terrain source")
            self.last_validation = rep
            return rep
        try:
            dem, spacing, crs = r.terrain.resolve()
            if not np.isfinite(dem).all():
                rep.error("terrain.nonfinite",
                          "DEM contains non-finite values and no nodata_fill",
                          "terrain")
            if dem.shape[0] < 2 or dem.shape[1] < 2:
                rep.error("terrain.too_small", f"DEM {dem.shape} too small",
                          "terrain")
        except Exception as exc:
            rep.fatal("terrain.unreadable", str(exc), "terrain")
            self.last_validation = rep
            return rep
        w, h = r.output.size_px
        if w <= 0 or h <= 0:
            rep.error("output.size", f"invalid output size {r.output.size_px}")
        if w * h > 64_000_000:
            rep.warning("output.large", f"{w}x{h} exceeds 64 MP; expect slow render")
        if isinstance(r.lighting, str):
            try:
                lighting_preset(r.lighting)
            except ValueError as exc:
                rep.error("lighting.preset", str(exc), "lighting")
        for i, layer in enumerate(r.layers):
            if isinstance(layer, VectorOverlayLayer):
                if layer.kind not in ("points", "lines", "polygons"):
                    rep.error("layer.kind", f"unknown vector kind {layer.kind!r}",
                              f"layers[{i}]")
                if not (0.0 <= layer.opacity <= 1.0):
                    rep.error("layer.opacity", "opacity must be in [0,1]",
                              f"layers[{i}]")
            elif isinstance(layer, RasterOverlayLayer):
                img = np.asarray(layer.image)
                if img.ndim != 3 or img.shape[2] not in (3, 4):
                    rep.error("layer.raster", "raster overlay must be (H,W,3|4)",
                              f"layers[{i}]")
            else:
                rep.error("layer.type", f"unknown layer type {type(layer).__name__}",
                          f"layers[{i}]")
        if r.output.samples < 1 or r.output.samples > 256:
            rep.error("output.samples", "samples must be in [1,256]")
        self.last_validation = rep
        return rep

    # -- plan --------------------------------------------------------------
    def compile_plan(self) -> dict:
        r = self.recipe
        dem, spacing, crs = r.terrain.resolve()
        h, w = dem.shape
        span = (w - 1) * spacing[0]
        lighting = (r.lighting if isinstance(r.lighting, LightSettings)
                    else lighting_preset(r.lighting))
        target = r.camera.target
        zs = r.terrain.z_scale
        if target is None:
            target = (span / 2.0, float(dem.mean()) * zs,
                      (h - 1) * spacing[1] / 2.0)
        radius = r.camera.radius or 1.2 * max(span, (h - 1) * spacing[1])

        params = make_terrain_params(
            size_px=r.output.size_px,
            terrain_span=span,
            z_scale=zs,
            cam_target=tuple(target),
            cam_radius=float(radius),
            cam_phi_deg=r.camera.phi_deg,
            cam_theta_deg=r.camera.theta_deg,
            fov_y_deg=r.camera.fov_y_deg,
            colormap=r.colormap,
            sampling=dict(aa_samples=r.output.samples),
        )
        params.light = lighting
        if r.water_level is not None:
            params.water = WaterSettings(enabled=True, level=float(r.water_level))
        if r.fog_density > 0:
            params.fog = FogSettings(enabled=True, density=float(r.fog_density))
        plan = {
            "dem": dem, "spacing": spacing, "crs": crs, "params": params,
            "span": span, "target": target, "radius": radius,
        }
        self._plan = plan
        return plan

    # -- overlay projection ------------------------------------------------
    def _project(self, plan, pts_xz: np.ndarray, height_offset: float) -> np.ndarray:
        """World (x, z) -> screen pixel coords using the render camera."""
        p = plan["params"]
        dem = plan["dem"]
        spacing = plan["spacing"]
        W, H = p.size_px
        origin = orbit_camera_origin(p.cam_target, p.cam_radius, p.cam_phi_deg,
                                     p.cam_theta_deg)
        right, up, fwd = camera_basis(origin, p.cam_target, (0, 1, 0))
        half_h = math.tan(math.radians(p.fov_y_deg) * 0.5)
        half_w = (W / H) * half_h
        pts = np.asarray(pts_xz, np.float64).reshape(-1, 2)
        # sample terrain height bilinearly
        cx = np.clip(pts[:, 0] / spacing[0], 0, dem.shape[1] - 1.001)
        cz = np.clip(pts[:, 1] / spacing[1], 0, dem.shape[0] - 1.001)
        x0 = cx.astype(int)
        z0 = cz.astype(int)
        fx = cx - x0
        fz = cz - z0
        hgt = (
            dem[z0, x0] * (1 - fx) * (1 - fz)
            + dem[z0, np.minimum(x0 + 1, dem.shape[1] - 1)] * fx * (1 - fz)
            + dem[np.minimum(z0 + 1, dem.shape[0] - 1), x0] * (1 - fx) * fz
            + dem[np.minimum(z0 + 1, dem.shape[0] - 1),
                  np.minimum(x0 + 1, dem.shape[1] - 1)] * fx * fz
        ) * p.z_scale + height_offset
        world = np.stack([pts[:, 0], hgt, pts[:, 1]], axis=1)
        v = world - origin
        zc = v @ fwd
        xc = v @ right
        yc = v @ up
        zc = np.maximum(zc, 1e-6)
        ndc_x = xc / (zc * half_w)
        ndc_y = yc / (zc * half_h)
        px = (ndc_x + 1) * 0.5 * W - 0.5
        py = (1 - ndc_y) * 0.5 * H - 0.5
        return np.stack([px, py], axis=1)

    # -- render ------------------------------------------------------------
    def render(self, path=None, cache=None, certificate=None,
               render_policy: str = "block_on_error") -> Frame:
        rep = self.validate()
        rep.raise_if_blocking(render_policy)
        plan = self.compile_plan()

        from .terrain.renderer import TerrainRenderer

        renderer = TerrainRenderer()
        frame = renderer.render_terrain_pbr_pom(
            params=plan["params"], heightmap=plan["dem"], cache=cache,
        )
        rgba = frame.rgba.copy()
        W, H = plan["params"].size_px

        # vector + raster overlays
        from .vector import VectorScene

        vs = VectorScene()
        for layer in self.recipe.layers:
            if isinstance(layer, RasterOverlayLayer):
                img = np.asarray(layer.image)
                if img.dtype == np.uint8:
                    img = img.astype(np.float32) / 255.0
                if img.shape[:2] != (H, W):
                    from .gis import resample_raster

                    img = np.stack(
                        [resample_raster(img[..., c], (H, W))
                         for c in range(img.shape[2])], axis=-1)
                a = (img[..., 3:4] if img.shape[2] == 4 else 1.0) * layer.opacity
                base = rgba[..., :3].astype(np.float32) / 255.0
                out = base * (1 - a) + img[..., :3] * a
                rgba[..., :3] = (np.clip(out, 0, 1) * 255 + 0.5).astype(np.uint8)
            elif isinstance(layer, VectorOverlayLayer):
                if layer.kind == "polygons":
                    rings = [self._project(plan, r, layer.height_offset)
                             for r in layer.coordinates]
                    vs.add_polygons(rings, color=layer.color, opacity=layer.opacity)
                elif layer.kind == "lines":
                    pts = self._project(plan, layer.coordinates, layer.height_offset)
                    vs.add_lines(pts, color=layer.color, width=layer.width,
                                 opacity=layer.opacity)
                else:
                    pts = self._project(plan, layer.coordinates, layer.height_offset)
                    vs.add_points(pts, color=layer.color, size=layer.width,
                                  opacity=layer.opacity)
        if vs.layers:
            rgb, alpha, _ = vs.render(W, H, base_rgb=rgba[..., :3].astype(np.float32) / 255.0)
            rgba[..., :3] = (np.clip(rgb, 0, 1) * 255 + 0.5).astype(np.uint8)

        # furniture
        fur = self.recipe.furniture
        from . import furniture as fx

        if fur.title:
            fx.draw_title_plate(rgba, fur.title, fur.subtitle)
        if fur.legend:
            dem = plan["dem"]
            fx.draw_legend(
                rgba,
                fx.LegendSpec(colormap=plan["params"].colormap,
                              vmin=float(dem.min()), vmax=float(dem.max()),
                              label=fur.legend_label),
                x=W - 70, y=H - 180,
            )
        if fur.scale_bar:
            mpp = plan["span"] / W
            fx.draw_scale_bar(rgba, fx.ScaleBarSpec(meters_per_pixel=mpp),
                              x=16, y=H - 28)
        if fur.north_arrow:
            fx.draw_north_arrow(rgba, x=16, y=16)
        if fur.graticule_spacing > 0:
            fx.draw_graticule(
                rgba, fx.GraticuleSpec(spacing=fur.graticule_spacing),
                (0.0, 0.0, plan["span"], plan["span"]),
            )

        out = Frame(rgba=rgba, metadata={**frame.metadata, "recipe": self.recipe.name})
        if certificate is not None:
            from .assurance.certificate import emit_certificate

            emit_certificate(certificate, f"mapscene.{self.recipe.name}",
                             {"frames": 1, "rgba": rgba})
        if path is not None:
            from .io.image import numpy_to_png

            numpy_to_png(path, rgba)
        return out

# forge3d_tpu/smoke.py
# Smoke/volumetrics: voxel smoke domains, a fluid step (semi-Lagrangian
# advection + buoyancy + pressure projection), emitters, and a volumetric
# raymarch renderer — all fused jnp device programs.
#
# Parity notes (reference behavior, not code):
#   /root/reference/src/smoke/{types,sim,sampling,render}.rs and
#   python/forge3d/smoke.py:36-343 — SmokeDomain voxel grids
#   (density/velocity/temperature/soot/emission), SmokeEmitter spherical
#   injection with rates and time window, SmokeStepSettings, ray-marched
#   render, memory/physics reports, AtmosphericSmokeCube ingestion
#   (HRRR-style density cubes for the wildfire video workload).
#
# TPU-native design: grids are (nz, ny, nx) arrays; advection is one fused
# gather (trilinear sample at backtraced positions), the pressure solve is
# `jacobi_iters` stencil sweeps (shifted adds — no gathers), and the
# renderer marches all pixels in lockstep with a lax.fori_loop. Axes: x is
# fastest (nx), y is vertical (buoyancy along +y), matching the renderer's
# world convention.

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .errors import UploadError

_F32 = jnp.float32


@dataclass
class SmokeEmitter:
    center: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    radius: float = 1.0
    density_rate: float = 1.0
    temperature_rate: float = 1.0
    fuel_rate: float = 0.0
    soot_rate: float = 0.2
    humidity_rate: float = 0.0
    emission_rate: float = 1.0
    velocity: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    start_time: float = 0.0
    end_time: float = float(np.finfo(np.float32).max)

    def __post_init__(self):
        if self.radius <= 0.0:
            raise ValueError("radius must be > 0")
        if self.end_time < self.start_time:
            raise ValueError("end_time must be >= start_time")


@dataclass
class SmokeStepSettings:
    dt: float = 1.0 / 30.0
    buoyancy: float = 1.0
    ambient_temperature: float = 0.0
    dissipation: float = 0.02
    velocity_damping: float = 0.02
    wind: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    jacobi_iters: int = 20
    vorticity: float = 0.0

    def __post_init__(self):
        if self.dt <= 0:
            raise ValueError("dt must be > 0")
        if self.jacobi_iters < 0:
            raise ValueError("jacobi_iters must be >= 0")


@dataclass
class SmokeRenderSettings:
    absorption: float = 1.2
    scattering: float = 0.8
    step_count: int = 64
    sun_steps: int = 8
    sun_dir: Tuple[float, float, float] = (0.4, 0.8, 0.3)
    sun_color: Tuple[float, float, float] = (1.0, 0.96, 0.9)
    smoke_albedo: Tuple[float, float, float] = (0.85, 0.85, 0.88)
    emission_color: Tuple[float, float, float] = (1.0, 0.45, 0.1)
    background: Tuple[float, float, float] = (0.25, 0.35, 0.55)


def _trilinear(grid, px, py, pz):
    """Sample (nz, ny, nx) grid at fractional voxel coords (x, y, z)."""
    nz, ny, nx = grid.shape
    x = jnp.clip(px, 0.0, nx - 1.000001)
    y = jnp.clip(py, 0.0, ny - 1.000001)
    z = jnp.clip(pz, 0.0, nz - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    fz = z - z0
    flat = grid.ravel()

    def at(dz, dy, dx):
        idx = ((z0 + dz) * ny + (y0 + dy)) * nx + (x0 + dx)
        return jnp.take(flat, idx)

    c000 = at(0, 0, 0)
    c001 = at(0, 0, 1)
    c010 = at(0, 1, 0)
    c011 = at(0, 1, 1)
    c100 = at(1, 0, 0)
    c101 = at(1, 0, 1)
    c110 = at(1, 1, 0)
    c111 = at(1, 1, 1)
    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


class SmokeDomain:
    """Voxel smoke domain of shape (nz, ny, nx); y is up."""

    def __init__(self, nx: int, ny: int, nz: int,
                 voxel_size=(1.0, 1.0, 1.0), origin=(0.0, 0.0, 0.0)):
        if min(nx, ny, nz) < 2:
            raise UploadError("smoke domain needs at least 2 voxels per axis")
        self.nx, self.ny, self.nz = int(nx), int(ny), int(nz)
        self.voxel_size = tuple(float(v) for v in voxel_size)
        self.origin = tuple(float(v) for v in origin)
        shape = (self.nz, self.ny, self.nx)
        self.density = jnp.zeros(shape, _F32)
        self.velocity = jnp.zeros((3, *shape), _F32)  # (vx, vy, vz)
        self.temperature = jnp.zeros(shape, _F32)
        self.soot = jnp.zeros(shape, _F32)
        self.emission = jnp.zeros(shape, _F32)
        self.time = 0.0
        self.steps = 0
        self._step_fn = None
        self._step_key = None

    # -- construction ------------------------------------------------------
    @staticmethod
    def from_density(density: np.ndarray, voxel_size=(1.0, 1.0, 1.0),
                     origin=(0.0, 0.0, 0.0)) -> "SmokeDomain":
        d = np.asarray(density, np.float32)
        if d.ndim != 3:
            raise UploadError("density must be 3D (nz, ny, nx)")
        nz, ny, nx = d.shape
        dom = SmokeDomain(nx, ny, nz, voxel_size, origin)
        dom.density = jnp.asarray(d)
        return dom

    def set_density(self, density: np.ndarray) -> None:
        d = np.asarray(density, np.float32)
        if d.shape != (self.nz, self.ny, self.nx):
            raise UploadError(f"density shape {d.shape} != domain {(self.nz, self.ny, self.nx)}")
        self.density = jnp.asarray(d)

    def set_velocity(self, velocity: np.ndarray) -> None:
        v = np.asarray(velocity, np.float32)
        if v.shape != (3, self.nz, self.ny, self.nx):
            raise UploadError("velocity must be (3, nz, ny, nx)")
        self.velocity = jnp.asarray(v)

    def set_temperature(self, t: np.ndarray) -> None:
        self.temperature = self._check(t)

    def set_soot(self, s: np.ndarray) -> None:
        self.soot = self._check(s)

    def set_emission(self, e: np.ndarray) -> None:
        self.emission = self._check(e)

    def _check(self, a):
        a = np.asarray(a, np.float32)
        if a.shape != (self.nz, self.ny, self.nx):
            raise UploadError("grid shape mismatch")
        return jnp.asarray(a)

    # -- emitters ----------------------------------------------------------
    def add_emitter(self, emitter: SmokeEmitter, dt: float) -> None:
        """Inject from a spherical emitter for dt seconds (smooth falloff)."""
        if not (emitter.start_time <= self.time <= emitter.end_time):
            return
        zs = jnp.arange(self.nz, dtype=_F32)[:, None, None]
        ys = jnp.arange(self.ny, dtype=_F32)[None, :, None]
        xs = jnp.arange(self.nx, dtype=_F32)[None, None, :]
        vx, vy, vz = self.voxel_size
        wx = self.origin[0] + (xs + 0.5) * vx
        wy = self.origin[1] + (ys + 0.5) * vy
        wz = self.origin[2] + (zs + 0.5) * vz
        d2 = ((wx - emitter.center[0]) ** 2 + (wy - emitter.center[1]) ** 2
              + (wz - emitter.center[2]) ** 2)
        w = jnp.exp(-d2 / (2.0 * (emitter.radius * 0.5) ** 2))
        w = jnp.where(d2 <= emitter.radius ** 2 * 4.0, w, 0.0)
        self.density = self.density + w * emitter.density_rate * dt
        self.temperature = self.temperature + w * emitter.temperature_rate * dt
        self.soot = self.soot + w * emitter.soot_rate * dt
        self.emission = self.emission + w * emitter.emission_rate * dt
        for c, vr in enumerate(emitter.velocity):
            self.velocity = self.velocity.at[c].add(w * vr * dt)

    # -- simulation --------------------------------------------------------
    def _build_step(self, s: SmokeStepSettings):
        nz, ny, nx = self.nz, self.ny, self.nx
        zs = jnp.arange(nz, dtype=_F32)[:, None, None]
        ys = jnp.arange(ny, dtype=_F32)[None, :, None]
        xs = jnp.arange(nx, dtype=_F32)[None, None, :]
        dt = s.dt
        jacobi = int(s.jacobi_iters)

        def advect(grid, vel):
            bx = xs - dt * vel[0]
            by = ys - dt * vel[1]
            bz = zs - dt * vel[2]
            return _trilinear(grid, bx, by, bz)

        def step(density, velocity, temperature, soot, emission):
            vel = velocity
            # forces: buoyancy (hot rises along +y) + wind + damping
            buoy = s.buoyancy * (temperature - s.ambient_temperature)
            vel = vel.at[1].add(dt * buoy)
            for c in range(3):
                vel = vel.at[c].add(dt * s.wind[c])
            vel = vel * (1.0 - s.velocity_damping)

            # self-advect velocity
            vel = jnp.stack([advect(vel[c], vel) for c in range(3)])

            # pressure projection (Jacobi on the Poisson eq), solid walls
            def lap_nb(p):
                xm = jnp.concatenate([p[:, :, :1], p[:, :, :-1]], axis=2)
                xp = jnp.concatenate([p[:, :, 1:], p[:, :, -1:]], axis=2)
                ym = jnp.concatenate([p[:, :1, :], p[:, :-1, :]], axis=1)
                yp = jnp.concatenate([p[:, 1:, :], p[:, -1:, :]], axis=1)
                zm = jnp.concatenate([p[:1], p[:-1]], axis=0)
                zp = jnp.concatenate([p[1:], p[-1:]], axis=0)
                return xm, xp, ym, yp, zm, zp

            def div_of(vel):
                xm, xp, _, _, _, _ = lap_nb(vel[0])
                _, _, ym, yp, _, _ = lap_nb(vel[1])
                _, _, _, _, zm, zp = lap_nb(vel[2])
                return 0.5 * ((xp - xm) + (yp - ym) + (zp - zm))

            div = div_of(vel)
            p = jnp.zeros_like(div)

            def jac(_, p):
                xm, xp, ym, yp, zm, zp = lap_nb(p)
                return (xm + xp + ym + yp + zm + zp - div) / 6.0

            p = jax.lax.fori_loop(0, jacobi, jac, p)
            xm, xp, ym, yp, zm, zp = lap_nb(p)
            vel = vel.at[0].add(-0.5 * (xp - xm))
            vel = vel.at[1].add(-0.5 * (yp - ym))
            vel = vel.at[2].add(-0.5 * (zp - zm))

            # advect scalars + dissipate
            keep = 1.0 - s.dissipation
            density = advect(density, vel) * keep
            temperature = advect(temperature, vel) * keep
            soot = advect(soot, vel) * keep
            emission = advect(emission, vel) * (keep * keep)
            return density, vel, temperature, soot, emission

        return jax.jit(step)

    def step(self, settings: Optional[SmokeStepSettings] = None,
             emitters=()) -> None:
        s = settings or SmokeStepSettings()
        for e in emitters:
            self.add_emitter(e, s.dt)
        key = (s.dt, s.buoyancy, s.ambient_temperature, s.dissipation,
               s.velocity_damping, s.wind, s.jacobi_iters)
        if self._step_key != key:
            self._step_fn = self._build_step(s)
            self._step_key = key
        (self.density, self.velocity, self.temperature, self.soot,
         self.emission) = self._step_fn(
            self.density, self.velocity, self.temperature, self.soot,
            self.emission)
        self.time += s.dt
        self.steps += 1

    # -- queries -----------------------------------------------------------
    def sample_density(self, position) -> float:
        vx, vy, vz = self.voxel_size
        px = (position[0] - self.origin[0]) / vx - 0.5
        py = (position[1] - self.origin[1]) / vy - 0.5
        pz = (position[2] - self.origin[2]) / vz - 0.5
        return float(_trilinear(self.density, jnp.asarray(px), jnp.asarray(py),
                                jnp.asarray(pz)))

    def to_density_numpy(self) -> np.ndarray:
        return np.asarray(self.density)

    def to_velocity_numpy(self) -> np.ndarray:
        return np.asarray(self.velocity)

    def to_temperature_numpy(self) -> np.ndarray:
        return np.asarray(self.temperature)

    def to_soot_numpy(self) -> np.ndarray:
        return np.asarray(self.soot)

    def to_emission_numpy(self) -> np.ndarray:
        return np.asarray(self.emission)

    def memory_report(self) -> dict:
        vox = self.nx * self.ny * self.nz
        return {
            "voxels": vox,
            "grids": 7,
            "bytes": vox * 4 * 7,
            "shape": (self.nz, self.ny, self.nx),
        }

    def physics_report(self) -> dict:
        return {
            "time": self.time,
            "steps": self.steps,
            "total_density": float(jnp.sum(self.density)),
            "max_density": float(jnp.max(self.density)),
            "max_speed": float(jnp.max(jnp.abs(self.velocity))),
            "max_temperature": float(jnp.max(self.temperature)),
        }

    # -- rendering ---------------------------------------------------------
    def render_rgba(self, width: int, height: int,
                    settings: Optional[SmokeRenderSettings] = None,
                    cam_origin=None, cam_look_at=None,
                    fov_y_deg: float = 45.0) -> np.ndarray:
        """Volumetric raymarch of the domain -> (H, W, 4) uint8."""
        s = settings or SmokeRenderSettings()
        ext = (self.nx * self.voxel_size[0], self.ny * self.voxel_size[1],
               self.nz * self.voxel_size[2])
        center = tuple(self.origin[i] + ext[i] * 0.5 for i in range(3))
        if cam_origin is None:
            cam_origin = (center[0], center[1] + ext[1] * 0.2,
                          center[2] + max(ext) * 1.8)
        if cam_look_at is None:
            cam_look_at = center
        from .camera import camera_basis

        right, up, fwd = camera_basis(cam_origin, cam_look_at, (0, 1, 0))
        import math

        half_h = math.tan(math.radians(fov_y_deg) * 0.5)
        half_w = (width / height) * half_h
        xsp = jax.lax.broadcasted_iota(_F32, (height, width), 1)
        ysp = jax.lax.broadcasted_iota(_F32, (height, width), 0)
        cx = (2 * (xsp + 0.5) / width - 1) * half_w
        cy = (1 - 2 * (ysp + 0.5) / height) * half_h
        dx = cx * right[0] + cy * up[0] + fwd[0]
        dy = cx * right[1] + cy * up[1] + fwd[1]
        dz = cx * right[2] + cy * up[2] + fwd[2]
        inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        dx, dy, dz = dx * inv, dy * inv, dz * inv
        ox, oy, oz = (jnp.full((height, width), c, _F32) for c in cam_origin)

        # box entry/exit
        b0 = self.origin
        b1 = tuple(self.origin[i] + ext[i] for i in range(3))

        def slab(o, d, lo, hi):
            invd = jnp.where(jnp.abs(d) > 1e-9, 1.0 / jnp.where(jnp.abs(d) > 1e-9, d, 1.0),
                             jnp.where(d >= 0, 1e9, -1e9))
            t0 = (lo - o) * invd
            t1 = (hi - o) * invd
            return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

        tx0, tx1 = slab(ox, dx, b0[0], b1[0])
        ty0, ty1 = slab(oy, dy, b0[1], b1[1])
        tz0, tz1 = slab(oz, dz, b0[2], b1[2])
        t_in = jnp.maximum(jnp.maximum(tx0, ty0), jnp.maximum(tz0, 0.0))
        t_out = jnp.minimum(jnp.minimum(tx1, ty1), tz1)
        has = t_in < t_out

        nsteps = int(s.step_count)
        dt_march = (t_out - t_in) / nsteps
        sun = np.asarray(s.sun_dir, np.float64)
        sun = sun / np.linalg.norm(sun)
        vxs, vys, vzs = self.voxel_size
        sigma_t = s.absorption + s.scattering

        def to_vox(wx, wy, wz):
            return ((wx - self.origin[0]) / vxs - 0.5,
                    (wy - self.origin[1]) / vys - 0.5,
                    (wz - self.origin[2]) / vzs - 0.5)

        def sun_trans(wx, wy, wz):
            acc = jnp.zeros_like(wx)
            ds = max(ext) / s.sun_steps * 0.5
            for i in range(1, int(s.sun_steps) + 1):
                px, py, pz = to_vox(wx + sun[0] * ds * i, wy + sun[1] * ds * i,
                                    wz + sun[2] * ds * i)
                acc = acc + _trilinear(self.density, px, py, pz)
            return jnp.exp(-sigma_t * acc * ds)

        def body(i, carry):
            tr, r, g, b = carry
            t = t_in + (i + 0.5) * dt_march
            wx = ox + t * dx
            wy = oy + t * dy
            wz = oz + t * dz
            px, py, pz = to_vox(wx, wy, wz)
            dens = _trilinear(self.density, px, py, pz)
            emis = _trilinear(self.emission, px, py, pz)
            soot = _trilinear(self.soot, px, py, pz)
            a = jnp.where(has, sigma_t * dens * dt_march, 0.0)
            att = jnp.exp(-a)
            lsun = sun_trans(wx, wy, wz)
            alb = jnp.asarray(s.smoke_albedo)
            soot_f = jnp.clip(soot / (dens + 1e-4), 0.0, 1.0)
            scat = (1.0 - att) * tr * lsun * s.scattering / jnp.maximum(sigma_t, 1e-6)
            ec = jnp.asarray(s.emission_color)
            glow = (1.0 - att) * tr * emis
            r = r + scat * (alb[0] * (1 - soot_f) + 0.05 * soot_f) * s.sun_color[0] + glow * ec[0]
            g = g + scat * (alb[1] * (1 - soot_f) + 0.05 * soot_f) * s.sun_color[1] + glow * ec[1]
            b = b + scat * (alb[2] * (1 - soot_f) + 0.05 * soot_f) * s.sun_color[2] + glow * ec[2]
            tr = tr * att
            return (tr, r, g, b)

        tr0 = jnp.ones((height, width), _F32)
        z = jnp.zeros((height, width), _F32)
        tr, r, g, b = jax.lax.fori_loop(0, nsteps, body, (tr0, z, z, z))

        bg = s.background
        r = r + tr * bg[0]
        g = g + tr * bg[1]
        b = b + tr * bg[2]
        ldr = jnp.stack([r, g, b], -1)
        ldr = ldr / (1.0 + ldr)
        # alpha = accumulated opacity (1 - transmittance), so the frame
        # composites correctly as an overlay; standalone viewers still see
        # the configured background color.
        alpha = np.clip(np.asarray(1.0 - tr), 0.0, 1.0)
        rgba = np.concatenate(
            [
                (np.clip(np.asarray(ldr), 0, 1) * 255 + 0.5).astype(np.uint8),
                (alpha[..., None] * 255 + 0.5).astype(np.uint8),
            ],
            axis=-1,
        )
        return rgba


def domain_from_density(density, voxel_size=(1.0, 1.0, 1.0), origin=(0.0, 0.0, 0.0)):
    return SmokeDomain.from_density(density, voxel_size, origin)


@dataclass
class AtmosphericSmokeCube:
    """Geospatial smoke cube (e.g. HRRR-derived) ready for a domain
    (reference: smoke.py:36-60)."""

    density: np.ndarray
    velocity: Optional[np.ndarray] = None
    voxel_size: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    origin: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    vertical_levels: tuple = ()
    times: tuple = ()
    crs: Optional[str] = None
    source: Optional[str] = None

    def __post_init__(self):
        self.density = np.ascontiguousarray(self.density, np.float32)
        if self.density.ndim != 3:
            raise UploadError("density must be 3D")
        if self.velocity is not None:
            v = np.ascontiguousarray(self.velocity, np.float32)
            if v.shape != (3, *self.density.shape):
                raise UploadError("velocity must be (3, nz, ny, nx)")
            self.velocity = v

    def to_domain(self) -> SmokeDomain:
        dom = domain_from_density(self.density, self.voxel_size, self.origin)
        if self.velocity is not None:
            dom.set_velocity(self.velocity)
        return dom


def native_smoke_available() -> bool:
    """Always True: the jnp engine IS the native engine on TPU."""
    return True

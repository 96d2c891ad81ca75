# forge3d_tpu/ops/traversal_mxu.py
# Matmul-gather heightfield traversal: the MXU-native fast path.
#
# Why this exists: the stackless maxmip DDA in ops/traversal.py is
# correct but gather-bound — XLA/TPU random element gathers run at
# ~100 M elems/s (PERF.md), ~75x below VPU rate, and the loop does ~5
# gathers/step x ~80 steps/ray. TPUs are built around the MXU; the way to
# make table lookups fast is to stop gathering and start contracting:
# a lookup of row r from table T is onehot(r) @ T — an MXU matmul.
#
# Structure (all lookups are one-hot contractions, zero gathers):
#   1. Coarse phase: a fixed coarse level (blocks of B=2^C cells,
#      grid <= 64x64) stores per-block [min|max] rows in a (CBH, 2*CBW)
#      table. A DDA over blocks tests the ray's height band per block:
#      rows = onehot_z @ table (MXU), then an elementwise one-hot x-select.
#   2. Patch fetch: on band overlap the ray fetches its block's full
#      (B+1)^2 corner-height patch with one matmul from a
#      (CBH, CBW*(B+1)^2) table -> (N, (B+1)^2) per-ray patch.
#   3. Fine phase: an in-block DDA over level-0 cells; the 4 bilinear
#      corners come from the ray's own patch row by one-hot multiply-sum
#      (VPU, no memory indirection); the exact quadratic leaf solve is
#      shared with ops/traversal.py, so hits agree bit-for-bit.
#
# Reference behavior matched (not copied):
#   /root/reference/src/shaders/hybrid_terrain_traversal.wgsl:193-314 —
#   same band-skip semantics, same front-to-back order, same leaf solve.

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .traversal import (HitResult, TerrainScene, TerrainSceneStatic,
                        _bilinear_h, _safe_inv, _slab_xz)

_F32 = jnp.float32
_I32 = jnp.int32
_EPS_CELL = 2.0 ** -12


class MxuTables(NamedTuple):
    """Device tables for the matmul-gather traversal (exaggeration baked)."""

    cmm: jax.Array     # (CBH, 2*CBW) f32: per block-row [min | max]
    ptab: jax.Array    # (CBH, CBW, P*P) f32: per-block corner patches


@dataclass(frozen=True)
class MxuStatic:
    block: int        # B = 2^C level-0 cells per block side
    p: int            # patch side = B + 1
    cbw: int          # coarse grid width (blocks)
    cbh: int
    rounds: int       # outer round cap
    k_coarse: int     # coarse DDA steps per round
    f_fine: int       # fine DDA steps per round (covers a block crossing)
    chunk: int        # rays per matmul chunk
    wz: int = 8       # patch-fetch window height (blocks)
    wx: int = 16      # patch-fetch window width (blocks)


def build_mxu_tables(heights: np.ndarray, *, exaggeration: float = 1.0,
                     block: int | None = None, chunk: int = 2048
                     ) -> Tuple[MxuTables, MxuStatic]:
    """Build coarse min-max + patch tables from a DEM.

    Block size defaults to the smallest power of two giving a coarse grid
    <= 64 per side; exaggeration is baked into the tables (rebuild to
    change it — tables are cheap, host-side numpy).
    """
    h = np.asarray(heights, np.float32) * np.float32(exaggeration)
    H, W = h.shape
    cell_h, cell_w = H - 1, W - 1
    if block is None:
        block = 1
        while (cell_w + block - 1) // block > 64 or \
              (cell_h + block - 1) // block > 64:
            block *= 2
    B = int(block)
    P = B + 1
    cbw = (cell_w + B - 1) // B
    cbh = (cell_h + B - 1) // B

    # pad heights with edge clamp so every block has a full P x P patch
    pad_h = cbh * B + 1
    pad_w = cbw * B + 1
    hp = np.pad(h, ((0, pad_h - H), (0, pad_w - W)), mode="edge")

    # patches: (cbh, cbw, P, P) sliding blocks
    patches = np.empty((cbh, cbw, P, P), np.float32)
    for bz in range(cbh):
        for bx in range(cbw):
            patches[bz, bx] = hp[bz * B: bz * B + P, bx * B: bx * B + P]
    cmin = patches.reshape(cbh, cbw, P * P).min(-1)
    cmax = patches.reshape(cbh, cbw, P * P).max(-1)

    tables = MxuTables(
        cmm=jnp.asarray(np.concatenate([cmin, cmax], axis=1)),   # (cbh, 2cbw)
        ptab=jnp.asarray(patches.reshape(cbh, cbw, P * P)),
    )
    # worst case: a ray crosses <= cbw + cbh + 1 blocks; each banded block
    # costs one round, and a ray can additionally stall while the patch
    # window serves nearer rays first. 4x slack covers grazing rays with
    # worst-case stalls (validated against the DDA engine); the while loop
    # exits early so typical chunks never pay for the cap.
    crossing = cbw + cbh + 2
    rounds = 4 * crossing + 8
    k_coarse = 4
    static = MxuStatic(block=B, p=P, cbw=cbw, cbh=cbh, rounds=rounds,
                       k_coarse=k_coarse, f_fine=2 * B + 2, chunk=chunk,
                       wz=min(8, cbh), wx=min(16, cbw))
    return tables, static


def _leaf_solve(h00, h10, h01, h11, scene, ro, rd, cx, cz, t0, t1, tmin, tmax):
    """Shared exact bilinear-patch quadratic solve (same math as
    traversal._leaf_intersect, with corners supplied by the caller)."""
    rox, roy, roz = ro
    rdx, rdy, rdz = rd
    ox = scene.origin_xz[0]
    oz = scene.origin_xz[1]
    sx = scene.spacing_xz[0]
    sz = scene.spacing_xz[1]
    cxf = cx.astype(_F32)
    czf = cz.astype(_F32)

    def dev(t):
        px = rox + t * rdx
        pz = roz + t * rdz
        u = jnp.clip((px - ox) / sx - cxf, 0.0, 1.0)
        v = jnp.clip((pz - oz) / sz - czf, 0.0, 1.0)
        return (roy + t * rdy) - _bilinear_h(h00, h10, h01, h11, u, v)

    tm = 0.5 * (t0 + t1)
    d0 = dev(t0)
    dm = dev(tm)
    d1 = dev(t1)
    c = d0
    a = 2.0 * d1 + 2.0 * d0 - 4.0 * dm
    b = d1 - d0 - a
    s_lin = -c / jnp.where(jnp.abs(b) > 1e-12, b, 1.0)
    lin_ok = (jnp.abs(b) > 1e-12) & (s_lin >= 0.0) & (s_lin <= 1.0)
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = -0.5 * (b + jnp.where(b >= 0.0, sq, -sq))
    safe_a = jnp.where(jnp.abs(a) < 1e-12, 1.0, a)
    r0 = q / safe_a
    r1 = jnp.where(jnp.abs(q) < 1e-30, 1e30,
                   c / jnp.where(jnp.abs(q) < 1e-30, 1.0, q))
    rlo = jnp.minimum(r0, r1)
    rhi = jnp.maximum(r0, r1)
    s_quad = jnp.where((rlo >= 0.0) & (rlo <= 1.0), rlo,
                       jnp.where((rhi >= 0.0) & (rhi <= 1.0), rhi, 1e30))
    quad_ok = (disc >= 0.0) & (s_quad <= 1.0)
    is_lin = jnp.abs(a) < 1e-12
    s_hit = jnp.where(is_lin, jnp.where(lin_ok, s_lin, 1e30),
                      jnp.where(quad_ok, s_quad, 1e30))
    t_hit = t0 + s_hit * (t1 - t0)
    ok = (s_hit <= 1.0) & (t_hit > tmin) & (t_hit < tmax)
    return ok, t_hit


def _trace_chunk(scene: TerrainScene, static: TerrainSceneStatic,
                 tables: MxuTables, ms: MxuStatic,
                 rox, roy, roz, rdx, rdy, rdz, tmin, tmax):
    """Trace one flat chunk of rays: (N,) arrays in, HitResult fields out."""
    N = rox.shape[0]
    B = ms.block
    P = ms.p
    P2 = P * P
    cbw, cbh = ms.cbw, ms.cbh
    cw, ch = static.cell_w, static.cell_h

    ox = scene.origin_xz[0]
    oz = scene.origin_xz[1]
    sx = scene.spacing_xz[0]
    sz = scene.spacing_xz[1]

    inv_dx = _safe_inv(rdx)
    inv_dz = _safe_inv(rdz)
    dom_enter, dom_exit = _slab_xz(
        rox, roz, inv_dx, inv_dz,
        ox, ox + _F32(cw) * sx, oz, oz + _F32(ch) * sz)
    t0 = jnp.maximum(dom_enter, tmin)
    t_exit = jnp.minimum(dom_exit, tmax)
    lat = jnp.maximum(jnp.abs(rdx) / sx, jnp.abs(rdz) / sz)
    eps_t = _F32(_EPS_CELL) / jnp.maximum(lat, 1e-8)

    iota_z = jax.lax.broadcasted_iota(_I32, (N, cbh), 1)
    iota_x = jax.lax.broadcasted_iota(_I32, (N, cbw), 1)
    iota_p = jax.lax.broadcasted_iota(_I32, (N, P2), 1)

    # B is a power of two by construction; use shifts (signed integer
    # division does not lower on all TPU backends)
    log2b = B.bit_length() - 1

    def block_of(t):
        pt = t + eps_t
        px = rox + pt * rdx
        pz = roz + pt * rdz
        cx = jnp.clip(jnp.floor((px - ox) / sx).astype(_I32), 0, cw - 1)
        cz = jnp.clip(jnp.floor((pz - oz) / sz).astype(_I32), 0, ch - 1)
        return cx, cz, cx >> log2b, cz >> log2b

    def block_span(bx, bz, t):
        x0 = (bx << log2b).astype(_F32)
        x1 = jnp.minimum((bx + 1) << log2b, cw).astype(_F32)
        z0 = (bz << log2b).astype(_F32)
        z1 = jnp.minimum((bz + 1) << log2b, ch).astype(_F32)
        nt0, nt1 = _slab_xz(rox, roz, inv_dx, inv_dz,
                            ox + x0 * sx, ox + x1 * sx,
                            oz + z0 * sz, oz + z1 * sz)
        return jnp.maximum(nt0, jnp.maximum(t, tmin)), jnp.minimum(nt1, t_exit)

    state = dict(
        t=t0,
        done=t0 > t_exit,
        pending=jnp.zeros(N, jnp.bool_),
        hit=jnp.zeros(N, jnp.bool_),
        hit_t=jnp.full(N, 1e30, _F32),
        cell_x=jnp.zeros(N, _I32),
        cell_z=jnp.zeros(N, _I32),
        patch=jnp.zeros((N, P2), _F32),
        pbx=jnp.zeros(N, _I32),
        pbz=jnp.zeros(N, _I32),
        fine=jnp.zeros(N, jnp.bool_),
        round=jnp.asarray(0, _I32),
    )

    import os as _os

    _dbg = _os.environ.get("FORGE3D_MXU_DEBUG_PHASE", "full")

    def coarse_step(s):
        live = (~s["done"]) & (~s["pending"]) & (~s["fine"])
        t = s["t"]
        _, _, bx, bz = block_of(t)
        nt0, nt1 = block_span(bx, bz, t)
        if _dbg == "dda":
            band = nt0 <= nt1          # debug: skip the matmul band test
        else:
            # MXU lookup: rows = onehot_z @ cmm -> [min | max] for the
            # whole block row; one-hot x-select on both halves.
            ohz = (bz[:, None] == iota_z).astype(_F32)
            ohx = (bx[:, None] == iota_x).astype(_F32)
            rows = jax.lax.dot_general(
                ohz, tables.cmm, (((1,), (0,)), ((), ())),
                preferred_element_type=_F32)                 # (N, 2cbw)
            bmin = jnp.sum(rows[:, :cbw] * ohx, axis=1)
            bmax = jnp.sum(rows[:, cbw:] * ohx, axis=1)
            ya = roy + nt0 * rdy
            yb = roy + nt1 * rdy
            band = ((nt0 <= nt1)
                    & ~(jnp.minimum(ya, yb) > bmax)
                    & ~(jnp.maximum(ya, yb) < bmin))
        go_fine = live & band
        advance = live & ~band
        new_t = jnp.where(advance, jnp.maximum(nt1, t + eps_t) + 0.0, t)
        exhausted = advance & (new_t >= t_exit)
        return dict(s,
                    t=new_t,
                    done=s["done"] | exhausted,
                    pending=s["pending"] | go_fine,
                    pbx=jnp.where(go_fine, bx, s["pbx"]),
                    pbz=jnp.where(go_fine, bz, s["pbz"]))

    WZ, WX = ms.wz, ms.wx
    iota_wz = jax.lax.broadcasted_iota(_I32, (N, WZ), 1)
    iota_wx = jax.lax.broadcasted_iota(_I32, (N, WX), 1)

    def _fetch_window(s):
        """Windowed fetch: dynamic-slice a (WZ, WX) block window centered
        at the min-key pending ray; one-hot inside the window scans
        WZ*WX*P^2 per ray (~30x less than the full table). Pending rays
        outside the window stall one round (the anchor is always served,
        so progress is guaranteed)."""
        pend = s["pending"]
        big = jnp.asarray(1 << 30, _I32)
        key = jnp.where(pend, s["pbz"] * cbw + s["pbx"], big)
        anchor = jnp.argmin(key)
        az = jnp.take(s["pbz"], anchor)
        ax = jnp.take(s["pbx"], anchor)
        base_z = jnp.clip(az - WZ // 2, 0, max(cbh - WZ, 0))
        base_x = jnp.clip(ax - WX // 2, 0, max(cbw - WX, 0))
        window = jax.lax.dynamic_slice(
            tables.ptab, (base_z, base_x, jnp.asarray(0, _I32)),
            (WZ, WX, P2))
        in_win = (pend
                  & (s["pbz"] >= base_z) & (s["pbz"] < base_z + WZ)
                  & (s["pbx"] >= base_x) & (s["pbx"] < base_x + WX))
        lz = jnp.clip(s["pbz"] - base_z, 0, WZ - 1)
        lx = jnp.clip(s["pbx"] - base_x, 0, WX - 1)
        ohz = (lz[:, None] == iota_wz).astype(_F32)
        ohx = (lx[:, None] == iota_wx).astype(_F32)
        S = jax.lax.dot_general(
            ohz, window.reshape(WZ, WX * P2), (((1,), (0,)), ((), ())),
            preferred_element_type=_F32)                 # (N, WX*P2)
        sel = jnp.einsum("nk,nkd->nd", ohx, S.reshape(N, WX, P2))
        patch = jnp.where(in_win[:, None], sel, s["patch"])
        return dict(s, patch=patch,
                    fine=s["fine"] | in_win,
                    pending=pend & ~in_win)

    def _fetch_full(s):
        """Full-table fetch: serves every pending ray in one pass; the
        one-hot scans cbh*cbw*P^2 per ray. Used when pending rays are
        spatially spread (windowing would stall most of them)."""
        pend = s["pending"]
        ohz = (jnp.where(pend, s["pbz"], 0)[:, None] == iota_z).astype(_F32)
        ohx = (jnp.where(pend, s["pbx"], 0)[:, None] == iota_x).astype(_F32)
        S = jax.lax.dot_general(
            ohz, tables.ptab.reshape(cbh, cbw * P2), (((1,), (0,)), ((), ())),
            preferred_element_type=_F32)                 # (N, cbw*P2)
        sel = jnp.einsum("nk,nkd->nd", ohx, S.reshape(N, cbw, P2))
        patch = jnp.where(pend[:, None], sel, s["patch"])
        return dict(s, patch=patch,
                    fine=s["fine"] | pend,
                    pending=jnp.zeros_like(pend))

    def fetch_patches(s):
        """Adaptive fetch: window when the pending set clusters (primary
        rays), full table when it spreads (shadow/bounce rays) — chosen
        per round by window coverage."""
        pend = s["pending"]
        big = jnp.asarray(1 << 30, _I32)
        key = jnp.where(pend, s["pbz"] * cbw + s["pbx"], big)
        anchor = jnp.argmin(key)
        az = jnp.take(s["pbz"], anchor)
        ax = jnp.take(s["pbx"], anchor)
        base_z = jnp.clip(az - WZ // 2, 0, max(cbh - WZ, 0))
        base_x = jnp.clip(ax - WX // 2, 0, max(cbw - WX, 0))
        in_win = (pend
                  & (s["pbz"] >= base_z) & (s["pbz"] < base_z + WZ)
                  & (s["pbx"] >= base_x) & (s["pbx"] < base_x + WX))
        n_pend = jnp.sum(pend)
        n_win = jnp.sum(in_win)
        # window pays off when it serves a clear majority
        use_window = (n_win * 4 >= n_pend * 3) & (cbh > WZ or cbw > WX)
        # Termination guarantee: in the last (crossing + 2) rounds force the
        # full-table fetch so every pending ray is served each round and
        # advances >= 1 block/round — a stalled ray can no longer reach the
        # round cap and silently report a miss (wrong shadows/holes).
        crossing = jnp.asarray(cbw + cbh + 2, _I32)
        in_tail = s["round"] >= (jnp.asarray(ms.rounds, _I32) - crossing - 2)
        use_window = use_window & ~in_tail
        return jax.lax.cond(use_window, _fetch_window, _fetch_full, s)

    def fine_step(s):
        live = (~s["done"]) & s["fine"]
        t = s["t"]
        cx, cz, bx, bz = block_of(t)
        in_block = (bx == s["pbx"]) & (bz == s["pbz"]) & (t < t_exit)
        active = live & in_block
        # cell ray span
        x0 = cx.astype(_F32)
        z0 = cz.astype(_F32)
        nt0, nt1 = _slab_xz(rox, roz, inv_dx, inv_dz,
                            ox + x0 * sx, ox + (x0 + 1) * sx,
                            oz + z0 * sz, oz + (z0 + 1) * sz)
        nt0 = jnp.maximum(nt0, jnp.maximum(t, tmin))
        nt1 = jnp.minimum(nt1, t_exit)
        # corners from the ray's own patch row: one-hot multiply-sum
        lx = cx - (s["pbx"] << log2b)
        lz = cz - (s["pbz"] << log2b)
        base = lz * P + lx
        oh = (base[:, None] == iota_p)
        patch = s["patch"]
        h00 = jnp.sum(jnp.where(oh, patch, 0.0), axis=1)
        h10 = jnp.sum(jnp.where((base + 1)[:, None] == iota_p, patch, 0.0), axis=1)
        h01 = jnp.sum(jnp.where((base + P)[:, None] == iota_p, patch, 0.0), axis=1)
        h11 = jnp.sum(jnp.where((base + P + 1)[:, None] == iota_p, patch, 0.0), axis=1)
        ok, t_hit = _leaf_solve(h00, h10, h01, h11, scene,
                                (rox, roy, roz), (rdx, rdy, rdz),
                                cx, cz, nt0, nt1, tmin, tmax)
        got = active & (nt0 <= nt1) & ok
        adv = active & ~got
        new_t = jnp.where(adv, jnp.maximum(nt1, t + eps_t), t)
        left = live & (~in_block)
        exhausted = adv & (new_t >= t_exit)
        return dict(s,
                    t=new_t,
                    done=s["done"] | got | exhausted,
                    fine=s["fine"] & ~(got | left | exhausted),
                    hit=s["hit"] | got,
                    hit_t=jnp.where(got, t_hit, s["hit_t"]),
                    cell_x=jnp.where(got, cx, s["cell_x"]),
                    cell_z=jnp.where(got, cz, s["cell_z"]))

    import os

    _phase = os.environ.get("FORGE3D_MXU_DEBUG_PHASE", "full")

    def round_body(s):
        s = jax.lax.fori_loop(0, ms.k_coarse, lambda i, ss: coarse_step(ss), s)
        if _phase in ("patch", "full"):
            s = jax.lax.cond(jnp.any(s["pending"]), fetch_patches,
                             lambda ss: ss, s)
        if _phase == "full":
            s = jax.lax.cond(
                jnp.any(s["fine"] & ~s["done"]),
                lambda ss: jax.lax.fori_loop(
                    0, ms.f_fine, lambda i, sss: fine_step(sss), ss),
                lambda ss: ss, s)
        if _phase != "full":
            # debug phases: clear pending/fine so the loop can terminate
            s = dict(s, done=s["done"] | s["pending"] | s["fine"],
                     pending=jnp.zeros_like(s["pending"]),
                     fine=jnp.zeros_like(s["fine"]))
        return dict(s, round=s["round"] + 1)

    def cond(s):
        return (~jnp.all(s["done"])) & (s["round"] < ms.rounds)

    out = jax.lax.while_loop(cond, round_body, state)
    return (out["hit"], jnp.where(out["hit"], out["hit_t"], tmax),
            out["cell_x"], out["cell_z"])


def trace_mxu(scene: TerrainScene, static: TerrainSceneStatic,
              tables: MxuTables, ms: MxuStatic,
              ro: Tuple[jax.Array, jax.Array, jax.Array],
              rd: Tuple[jax.Array, jax.Array, jax.Array],
              tmin=1e-3, tmax=1e30) -> HitResult:
    """Matmul-gather trace; drop-in for traversal.trace.

    Rays are processed in `ms.chunk`-sized chunks (the patch matmul's
    (chunk, cbw*P^2) intermediate must fit comfortably in VMEM/HBM
    bandwidth); spatially-contiguous chunks exit their round loop early.
    """
    rox, roy, roz = (jnp.asarray(x, _F32) for x in ro)
    rdx, rdy, rdz = (jnp.asarray(x, _F32) for x in rd)
    shape = jnp.broadcast_shapes(rox.shape, rdx.shape)
    rox, roy, roz, rdx, rdy, rdz = (
        jnp.broadcast_to(x, shape).ravel()
        for x in (rox, roy, roz, rdx, rdy, rdz))
    tmin = jnp.asarray(tmin, _F32)
    tmax = jnp.asarray(tmax, _F32)

    n = rox.shape[0]
    chunk = min(ms.chunk, max(n, 1))
    pad = (-n) % chunk
    if pad:
        # padded rays: degenerate down-ray at origin, immediately done
        padv = lambda a, v: jnp.concatenate([a, jnp.full(pad, v, a.dtype)])
        rox, roy, roz = padv(rox, 0), padv(roy, -1e9), padv(roz, 0)
        rdx, rdy, rdz = padv(rdx, 0), padv(rdy, -1), padv(rdz, 0)
    nc = (n + pad) // chunk

    def run(chunk_args):
        cx, cy, cz, dx, dy, dz = chunk_args
        return _trace_chunk(scene, static, tables, ms,
                            cx, cy, cz, dx, dy, dz, tmin, tmax)

    args = tuple(a.reshape(nc, chunk)
                 for a in (rox, roy, roz, rdx, rdy, rdz))
    if nc == 1:
        hit, t, cx_, cz_ = run(tuple(a[0] for a in args))
    else:
        hit, t, cx_, cz_ = jax.lax.map(run, args)
        hit, t, cx_, cz_ = (a.ravel() for a in (hit, t, cx_, cz_))
    if pad:
        hit, t, cx_, cz_ = (a[:n] for a in (hit, t, cx_, cz_))
    return HitResult(hit=hit.reshape(shape), t=t.reshape(shape),
                     cell_x=cx_.reshape(shape), cell_z=cz_.reshape(shape))

# Geometry hypothesis: exact scatter-transform chain (pack_instance_transforms,
# y-up mesh at render_pos with depth=terrain height, uplift=scene z).
import sys, math, copy
from pathlib import Path
import numpy as np
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import tests.test_reference_golden_parity as P
from forge3d_tpu.mapscene import MapScene, camera_basis
from forge3d_tpu.io.image import png_to_numpy, numpy_to_png
from forge3d_tpu.utils.metrics import ssim
from scipy.optimize import minimize

rec = P._recipes()["mapscene_buildings"]
ms = MapScene(rec)
plan = ms.compile_plan()
rec2 = copy.deepcopy(rec); rec2.layers = []
base = MapScene(rec2).render().rgba.copy()
ref = png_to_numpy(P.REF_GOLDENS / "mapscene_buildings.png").astype(np.float32)[..., :3]
basef = base[..., :3].astype(np.float32)
gold_mask = (np.abs(ref - basef).max(-1) > 20)

layer = rec.layers[0]
feats = []
mats = list(layer.materials); roofs = list(layer.roof_types)
for k, (fp, h) in enumerate(zip(layer.footprints, layer.heights)):
    feats.append((np.asarray(fp, np.float64), float(h), mats[k], roofs[k]))
allpts = np.concatenate([f[0] for f in feats]); mn = allpts.min(0); mx = np.maximum(allpts.max(0), mn+1e-9)
def to_scene(fp):
    n = (fp - mn)/(mx - mn)
    return np.stack([n[:,0]*1.7-0.85, (1.0-n[:,1])*1.7-0.85], 1)

DEM = np.asarray(rec.terrain.dem, np.float64)  # 8x8
S = 8/1.7/8  # 0.588
def dem_h(cx_c, cz_c):
    row = (cz_c/8.0)*7; col = (cx_c/8.0)*7
    r0, c0 = int(np.floor(row)), int(np.floor(col))
    r1, c1 = min(r0+1,7), min(c0+1,7)
    fr, fc = row-r0, col-c0
    return float(DEM[r0,c0]*(1-fr)*(1-fc)+DEM[r0,c1]*(1-fr)*fc+DEM[r1,c0]*fr*(1-fc)+DEM[r1,c1]*fr*fc) - float(DEM.min())

# build triangle soup in scatter-world space
def build_world():
    tris, norms, cols = [], [], []
    for fp, h, mat, roof in feats:
        sc = to_scene(fp)
        wall_h = max(0.08, min(1.4, h/45.0))
        col = np.asarray(MapScene._BUILDING_PALETTE[mat][:3], np.float64)/255.0
        ftris, fnorms, fcols = ms._building_mesh_tris(sc, wall_h, col, col) if False else MapScene._building_mesh_tris(ms, sc, wall_h, roof, col)
        xc = (sc[:,0].min()+sc[:,0].max())/2; zc = (sc[:,1].min()+sc[:,1].max())/2
        cx_c = (xc+0.85)*8/1.7; cz_c = (zc+0.85)*8/1.7
        by = dem_h(cx_c, cz_c)
        def warp(v):
            sx, sy, sz = v
            return (0.588235*sx, 0.588235*zc + 0.588235*sy + 0.0, by - 0.5 + 0.588235*(sz - zc))
        for (a,b,c), n in zip(ftris, fnorms):
            tris.append((warp(a), warp(b), warp(c)))
            # normals: x stays x, y->y, z->z (uniform scale+translate) BUT axes permuted:
            # scene (x,y,z) -> world (x, y(from sy & zc), z(from sz)): x->x, height y->world y, sz->world z
            norms.append((n[0], n[1], n[2]))
        cols += fcols
    return tris, norms, cols

TRIS, NORMS, COLS = build_world()

def render(v):
    az, el, dist, fov, laz, lel, inten = v
    a = math.radians(az); e = math.radians(el)
    t = np.zeros(3)
    h = dist*math.cos(e)
    eye = t + np.array([h*math.sin(a), dist*math.sin(e), h*math.cos(a)])
    right, up, fwd = camera_basis(eye, t, (0,1,0))
    W, H = 128, 88
    half_h = math.tan(math.radians(max(5,min(120,fov)))*0.5); half_w = (W/H)*half_h
    la, le = math.radians(laz), math.radians(lel)
    lhat = np.array([math.cos(le)*math.sin(la), math.sin(le), math.cos(le)*math.cos(la)])
    shades = []
    for n, c in zip(NORMS, COLS):
        ndotl = max(float(-np.dot(n, lhat)), 0.0)
        shades.append(np.clip(c*(0.2+0.7*ndotl*max(inten,0)), 0, 1))
    SSs = 2
    img = MapScene._raster_tris(TRIS, shades, eye, right, up, fwd, half_w, half_h, W*SSs, H*SSs)
    mrgb = img.reshape(H,SSs,W,SSs,3).mean((1,3))
    mu8 = np.clip(mrgb*255+0.5, 0, 255)
    out = basef.copy()
    ov = mu8.max(-1) > 8
    out = np.where(ov[...,None], mu8, out)
    return out

def obj(v):
    got = render(v)
    m = np.abs(got - basef).max(-1) > 20
    i = (m & gold_mask).sum()/max((m | gold_mask).sum(),1)
    s = float(ssim(ref/255.0, got/255.0))
    return -(0.3*i + 0.7*s)

best=None
for az in (35, 125, 215, 305):
    for el in (10, 30, 50):
        s0 = (az, el, 2.0, 45, 135, 80, 1.15)
        r = minimize(obj, s0, method='Nelder-Mead', options={'maxfev':350,'xatol':0.005,'fatol':1e-5})
        v=-r.fun
        got = render(r.x); s = float(ssim(ref/255.0, got/255.0))
        print(az, el, "->", round(v,4), "ssim", round(s,4), tuple(round(x,2) for x in r.x), flush=True)
        if best is None or s>best[0]: best=(s, tuple(r.x))
print("BEST ssim", best[0], tuple(round(x,3) for x in best[1]))
got = render(best[1])
numpy_to_png("/tmp/bld_fit13.png", np.repeat(np.repeat(np.concatenate([ref.astype(np.uint8), got.astype(np.uint8)],1),3,0),3,1))

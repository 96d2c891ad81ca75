exec(open('scripts/fit_buildings16.py').read().split("def obj(")[0])
from scipy.optimize import minimize
def obj(v):
    got = render(v)
    m = np.abs(got - basef).max(-1) > 20
    i = (m & gold_mask).sum()/max((m | gold_mask).sum(),1)
    s = float(ssim(ref/255.0, got/255.0))
    return -(0.3*i+0.7*s)
starts = [
  (314.65, 45.92, 1.611, 49.03, 155.2, 103.8, 1.09, 0.672, 1.414, -0.609, 0.596, 0.584),
  (45.35, 45.92, 1.611, 49.03, 155.2, 103.8, 1.09, 0.672, 1.414, 0.609, 0.596, 0.584),
  (45.35, 45.92, 1.611, 49.03, 155.2, 103.8, 1.09, 0.672, -1.414, 0.609, 0.596, 0.584),
  (135.0, 45.92, 1.611, 49.03, 155.2, 103.8, 1.09, 0.672, 1.414, -0.609, 0.596, 0.584),
  (135.0, 45.92, 1.611, 49.03, 155.2, 103.8, 1.09, -0.672, 1.414, 0.609, 0.596, -0.584),
  (225.0, 45.92, 1.611, 49.03, 155.2, 103.8, 1.09, 0.672, -1.414, 0.609, 0.596, 0.584),
]
best=None
for sj in starts:
    r = minimize(obj, sj, method='Nelder-Mead', options={'maxfev':900,'xatol':0.002,'fatol':1e-6})
    got = render(r.x); s = float(ssim(ref/255.0, got/255.0))
    print(tuple(round(x,1) for x in sj[:2]), sj[8], sj[9], "->", round(-r.fun,4), "ssim", round(s,4), flush=True)
    if best is None or s>best[0]: best=(s, tuple(r.x))
print("BEST ssim", best[0])
print("params", tuple(round(float(x),4) for x in best[1]))
got = render(best[1])
numpy_to_png("/tmp/bld_fit18.png", np.repeat(np.repeat(np.concatenate([ref.astype(np.uint8), got.astype(np.uint8)],1),3,0),3,1))

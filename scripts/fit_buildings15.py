exec(open('scripts/fit_buildings14.py').read().split("s0 = (317.0")[0])
from scipy.optimize import minimize
starts = [
  (135, 45, 1.64, 48, 160, 104, 1.13, 0,0,0, 0.645, 1.404),
  (135, 45, 1.64, 48, 160, 104, 1.13, 0,0,0, 0.645, -1.404),
  (135, 45, 1.64, 48, 160, 76, 1.13, 0,0,0, -0.645, 1.404),
  (315, 45, 1.64, 48, 160, 104, 1.13, 0,0,0, 0.645, -1.404),
  (315, 45, 1.64, 48, 160, 104, 1.13, 0,0,0, -0.645, 1.404),
  (315, 45, 1.64, 48, 160, 104, 1.13, 0,0,0, -0.645, -1.404),
]
best=None
for sj in starts:
    r = minimize(obj, sj, method='Nelder-Mead', options={'maxfev':700,'xatol':0.002,'fatol':1e-6})
    got = render(r.x); s = float(ssim(ref/255.0, got/255.0))
    print(sj[0], sj[10], sj[11], "->", round(-r.fun,4), "ssim", round(s,4), tuple(round(float(x),2) for x in r.x), flush=True)
    if best is None or s>best[0]: best=(s, tuple(r.x))
print("BEST ssim", best[0])
print("params", tuple(round(float(x),4) for x in best[1]))
got = render(best[1])
numpy_to_png("/tmp/bld_fit15.png", np.repeat(np.repeat(np.concatenate([ref.astype(np.uint8), got.astype(np.uint8)],1),3,0),3,1))

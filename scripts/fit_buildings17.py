exec(open('scripts/fit_buildings16.py').read().split("def obj(")[0])
from scipy.optimize import minimize
def obj(v):
    got = render(v)
    m = np.abs(got - basef).max(-1) > 20
    i = (m & gold_mask).sum()/max((m | gold_mask).sum(),1)
    s = float(ssim(ref/255.0, got/255.0))
    return -(0.3*i+0.7*s)
s0 = (314.65, 45.92, 1.611, 49.03, 155.2, 103.8, 1.09, 0.672, 1.414, 0.609, 0.596, 0.584)
# material variants
for name, mats in [("swapped", ["brick","concrete","brick","concrete"]),
                   ("allbrick", ["brick"]*4),
                   ("orig", ["concrete","brick","concrete","brick"])]:
    for k in range(4):
        feats[k] = (feats[k][0], feats[k][1], mats[k], feats[k][3])
    r = minimize(obj, s0, method='Nelder-Mead', options={'maxfev':600,'xatol':0.002,'fatol':1e-6})
    got = render(r.x); s = float(ssim(ref/255.0, got/255.0))
    print(name, "->", round(-r.fun,4), "ssim", round(s,4), flush=True)
    numpy_to_png(f"/tmp/bld_mat_{name}.png", np.repeat(np.repeat(np.concatenate([ref.astype(np.uint8), got.astype(np.uint8)],1),3,0),3,1))

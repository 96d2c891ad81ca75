exec(open('/root/repo/scripts/fit_family_profile2.py').read().split("v0 = [")[0])
v0 = [0.9502, 126.66, 138.05, 38.49, -0.6489, -0.1423, 0.1878, 51.14, 2.287, 0.3369, 0.0, 1.1223]
p, i_, a_ = make(v0)
sc = score(p, max(i_,0.0), a_)
print("start", {k: round(v,3) for k,v in sc.items()}, round(sum(sc.values()),4), flush=True)
rng = np.random.default_rng(5)
cur = (sum(sc.values()), v0)
scale = np.array([0.05, 8., 8., 6., 0.05, 0.05, 0.05, 6., 0.6, 0.04, 0.05, 0.15])
for it in range(250):
    cand = [c + rng.normal(0, s) for c, s in zip(cur[1], scale)]
    cand[10] = max(cand[10], 0.0)
    p, i_, a_ = make(cand)
    try: sc = score(p, i_, a_)
    except Exception: continue
    v = sum(sc.values())
    if v > cur[0]:
        cur = (v, cand); scale *= 0.97
        print(f"it {it}: {v:.4f}", flush=True)
print("FINAL", round(cur[0],4))
p, i_, a_ = make(cur[1])
sc = score(p, i_, a_)
print({k: round(v,4) for k,v in sc.items()})
print("vec:", [round(float(x),4) for x in cur[1]])

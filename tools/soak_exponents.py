#!/usr/bin/env python3
"""Fit per-op scale exponents from a SOAK_r*.json (one JSON line per
scale factor, the graft.Soak output): least-squares slope of
log10(median_sec) and log10(shuffle_mb) against log10(sf), where sf is
parsed from the directory name (sf0.1/sf0.3/sf1). A 2-point file
degenerates to the ratio exponent; 3+ points separate the fixed-cost
term from the data term (the intercept absorbs job setup).
Usage: tools/soak_exponents.py SOAK_r10.json
"""
import json, math, sys, re

path = sys.argv[1] if len(sys.argv) > 1 else "SOAK_r10.json"
points = []
for line in open(path):
    line = line.strip()
    if not line:
        continue
    d = json.loads(line)
    m = re.search(r"sf([0-9.]+)$", d["sf"].rstrip("/"))
    points.append((float(m.group(1)), d))
points.sort()

def slope(xs, ys):
    n = len(xs)
    mx, my = sum(xs)/n, sum(ys)/n
    den = sum((x-mx)**2 for x in xs)
    return sum((x-mx)*(y-my) for x, y in zip(xs, ys))/den if den else float("nan")

ops = list(points[0][1]["medians"].keys())
print(f"{'op':28s} " + " ".join(f"sf{sf:g}_s" .rjust(9) for sf, _ in points)
      + "  wall_exp" + " ".join(f"sf{sf:g}_MB".rjust(9) for sf, _ in points)
      + "  shuf_exp")
for op in ops:
    med = [(sf, d["medians"].get(op, -1.0)) for sf, d in points]
    shf = [(sf, d["shuffle_mb_per_rep"].get(op, -1.0)) for sf, d in points]
    ok_m = [(sf, v) for sf, v in med if v > 0]
    ok_s = [(sf, v) for sf, v in shf if v > 0]
    we = slope([math.log10(sf) for sf, _ in ok_m],
               [math.log10(v) for _, v in ok_m]) if len(ok_m) >= 2 else float("nan")
    se = slope([math.log10(sf) for sf, _ in ok_s],
               [math.log10(v) for _, v in ok_s]) if len(ok_s) >= 2 else float("nan")
    print(f"{op:28s} " + " ".join(f"{v:9.2f}" for _, v in med)
          + f"  {we:7.2f} " + " ".join(f"{v:9.1f}" for _, v in shf)
          + f"  {se:7.2f}")

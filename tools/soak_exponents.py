#!/usr/bin/env python3
"""Fit per-op scale exponents from a SOAK_r*.json (one JSON line per
scale factor, the graft.Soak output): least-squares slope of
log10(median_sec) and log10(shuffle_mb) against log10(sf), where sf is
parsed from the directory name (sf0.1/sf0.3/sf1). A 2-point file
degenerates to the ratio exponent; 3+ points separate the fixed-cost
term from the data term (the intercept absorbs job setup).
Multiple lines for the same scale factor merge per-op with
later-lines-win semantics, so a partial re-run (SPARK_GRAFT_SOAK_ONLY)
appended after a fix patches the earlier full pass without rewriting
the artifact.
Usage: tools/soak_exponents.py SOAK_r10.json
"""
import json, math, sys, re

path = sys.argv[1] if len(sys.argv) > 1 else "SOAK_r10.json"
by_sf = {}
for line in open(path):
    line = line.strip()
    if not line:
        continue
    d = json.loads(line)
    m = re.search(r"sf([0-9.]+)$", d["sf"].rstrip("/"))
    if m is None:
        sys.exit(f"cannot parse a scale factor from sf dir {d['sf']!r} "
                 "(expected a path ending in sf<number>)")
    sf = float(m.group(1))
    merged = by_sf.setdefault(sf, {})
    for section in ("medians", "runs", "shuffle_mb_per_rep",
                    "shuffle_krec_per_rep", "load_at_start",
                    "load_per_rep", "ext_busy_per_rep"):
        merged.setdefault(section, {}).update(d.get(section, {}))
points = sorted(by_sf.items())

def slope(xs, ys):
    n = len(xs)
    mx, my = sum(xs)/n, sum(ys)/n
    den = sum((x-mx)**2 for x in xs)
    return sum((x-mx)*(y-my) for x, y in zip(xs, ys))/den if den else float("nan")

def local_exp(a, b):
    """Exponent over one adjacent pair: log(v_b/v_a)/log(sf_b/sf_a)."""
    (sfa, va), (sfb, vb) = a, b
    if va <= 0 or vb <= 0:
        return float("nan")
    return math.log10(vb / va) / math.log10(sfb / sfa)

def two_term(pts):
    """Least-squares t = a + b*sf (a = fixed overhead, b*sf = data
    term), a clamped to >= 0. Returns (a, b, data-term share at the
    largest point) — the sub-linear wall exponents at small sf are
    exactly this a dominating; the share at the top point says how
    much of the biggest measurement is genuinely data-driven."""
    if len(pts) < 2:
        return float("nan"), float("nan"), float("nan")
    xs = [sf for sf, _ in pts]; ys = [v for _, v in pts]
    n = len(xs); mx = sum(xs)/n; my = sum(ys)/n
    den = sum((x-mx)**2 for x in xs)
    b = sum((x-mx)*(y-my) for x, y in zip(xs, ys))/den if den else 0.0
    a = my - b*mx
    if a < 0:           # pure data term fits better than a negative floor
        a = 0.0
        b = sum(x*y for x, y in zip(xs, ys))/sum(x*x for x in xs)
    top_sf, top_v = pts[-1]
    share = b*top_sf/top_v if top_v > 0 else float("nan")
    return a, b, share

# union across ALL points (first-seen order): an op soaked only at the
# larger scale factors must still appear, per the partial-re-run merge
# semantics above
ops = list(dict.fromkeys(
    op for _, d in points for op in d["medians"]))
print(f"{'op':28s} " + " ".join(f"sf{sf:g}_s" .rjust(9) for sf, _ in points)
      + "  wall_exp  local_w" + " ".join(f"sf{sf:g}_MB".rjust(9)
                                         for sf, _ in points)
      + "  shuf_exp  local_s")
for op in ops:
    med = [(sf, d["medians"].get(op, -1.0)) for sf, d in points]
    shf = [(sf, d["shuffle_mb_per_rep"].get(op, -1.0)) for sf, d in points]
    ok_m = [(sf, v) for sf, v in med if v > 0]
    ok_s = [(sf, v) for sf, v in shf if v > 0]
    we = slope([math.log10(sf) for sf, _ in ok_m],
               [math.log10(v) for _, v in ok_m]) if len(ok_m) >= 2 else float("nan")
    se = slope([math.log10(sf) for sf, _ in ok_s],
               [math.log10(v) for _, v in ok_s]) if len(ok_s) >= 2 else float("nan")
    # pairwise local exponents: with 3 points the first pair carries
    # the fixed-cost amortization (small absolute times), the LAST pair
    # is the data term — the 100x-relevant figure
    lw = "/".join(f"{local_exp(med[i], med[i+1]):.2f}"
                  for i in range(len(med) - 1))
    ls = "/".join(f"{local_exp(shf[i], shf[i+1]):.2f}"
                  for i in range(len(shf) - 1))
    a, b, share = two_term(ok_m)
    # record exponent: compression-independent movement (bytes inflate
    # ~10-20% at larger synthesized sf from copy-offset id entropy;
    # records are exactly the rows the plan moves). Printed only for
    # ops re-soaked since the field was added.
    rec = [(sf, d.get("shuffle_krec_per_rep", {}).get(op, -1.0))
           for sf, d in points]
    ok_r = [(sf, v) for sf, v in rec if v > 0]
    re_ = (slope([math.log10(sf) for sf, _ in ok_r],
                 [math.log10(v) for _, v in ok_r])
           if len(ok_r) >= 2 else float("nan"))
    rtxt = f"  rec_exp={re_:5.2f}" if ok_r else ""
    # per-rep evidence at the TOP point (round-11 instrumentation):
    # rep spread = max/min wall of the successful reps, and the worst
    # external-CPU fraction any rep started at — the wall columns are
    # usable evidence exactly when spread is tight and ext_busy is ~0
    top_d = next((d for _, d in reversed(points)
                  if d.get("runs", {}).get(op)), points[-1][1])
    top_runs = [t for t in top_d.get("runs", {}).get(op, []) if t > 0]
    spread = (max(top_runs) / min(top_runs)) if len(top_runs) >= 2 else float("nan")
    ebs = [e for e in top_d.get("ext_busy_per_rep", {}).get(op, [])
           if e >= 0]
    etxt = (f"  top_spread={spread:4.2f} top_ext_busy<={max(ebs):.3f}"
            if ebs else (f"  top_spread={spread:4.2f}"
                         if top_runs else ""))
    print(f"{op:28s} " + " ".join(f"{v:9.2f}" for _, v in med)
          + f"  {we:7.2f} {lw:>9s} " + " ".join(f"{v:9.1f}" for _, v in shf)
          + f"  {se:7.2f} {ls:>9s}"
          + f"  fix={a:6.2f}s data@top={share:4.0%}" + rtxt + etxt)

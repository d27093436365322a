#!/usr/bin/env python3
"""Independent float64 twin of the reference's SGD update kernels, used
to derive the oracle VALUES for the q174-q177 strict gates.

Each kernel below is reimplemented directly from the REFERENCE Cython
(MatrixFactorizationImpressions_Cython_Epoch.pyx FUNK_SVD :330-448,
ASY_SVD :449-630, BPR :636-742, adaptive_gradient :905-943,
_apply_minibatch_updates :838-899; SLIM_BPR_Cython_Epoch.pyx dense path
:212-310) with the graft engine's documented determinizations (injected
sample order, rational (id, salt) init) -- NOT transcribed from the
Scala. Plain python floats are IEEE float64, same as the JVM's Double.

Run: python3 tools/sgd_twin.py
Prints the VALUES rows per gate plus the minimum margin of every value
from its 6-decimal rounding boundary (must be >> float drift ~1e-13).
"""
import math
from collections import OrderedDict

RANK = 2
URM = [(0, 0, 1.0), (0, 1, 2.0), (1, 1, 3.0), (1, 2, 1.0), (1, 3, 2.0),
       (2, 0, 2.0)]
ITEMS = sorted({i for _, i, _ in URM})
PROFILE = {}
RATING = {}
for u, i, v in URM:
    PROFILE.setdefault(u, []).append(i)
    RATING[(u, i)] = v


def init_vec(ident, salt):
    # sevenths: non-terminating decimal expansions, so no kernel value
    # can land exactly on a 6-decimal rounding boundary the way the
    # q153 dyadic /4 init did for the transcendental-free funk path
    return [(1.0 + ident + 2 * f + salt) / 7.0 for f in range(RANK)]


margins = []


def r6(v):
    r = round(v, 6)
    # distance of v*1e6 from the nearest .5 rounding boundary
    frac = abs(v * 1e6 - math.floor(v * 1e6) - 0.5)
    margins.append((frac / 1e6, v))
    return r


def emit(rows):
    return [(k, ident, f, r6(v)) for (k, ident, f, v) in rows]


# ---------------------------------------------------------------- funk
def funk_epoch(samples, lr, reg, bias_reg):
    uf, itf = {}, {}
    mu = 0.0
    bu, bi = {}, {}
    loss = 0.0
    for u, item, rating in samples:
        wu = uf.setdefault(u, init_vec(u, 0))
        hi = itf.setdefault(item, init_vec(item, 1))
        pred = mu + bu.get(u, 0.0) + bi.get(item, 0.0)
        for f in range(RANK):
            pred += wu[f] * hi[f]
        err = rating - pred
        loss += err * err
        mu += lr * (err - bias_reg * mu)
        bu[u] = bu.get(u, 0.0) + lr * (err - bias_reg * bu.get(u, 0.0))
        bi[item] = bi.get(item, 0.0) + lr * (err - bias_reg * bi.get(item, 0.0))
        for f in range(RANK):
            h_old, w_old = hi[f], wu[f]
            hi[f] += lr * (err * w_old - reg * h_old)
            wu[f] += lr * (err * h_old - reg * w_old)
    mse = loss / len(samples)
    rows = []
    for u in sorted(uf):
        for f in range(RANK):
            rows.append(('w', u, f, uf[u][f]))
    for i in sorted(itf):
        for f in range(RANK):
            rows.append(('h', i, f, itf[i][f]))
    for u in sorted(bu):
        rows.append(('bu', u, 0, bu[u]))
    for i in sorted(bi):
        rows.append(('bi', i, 0, bi[i]))
    rows.append(('mu', 0, 0, mu))
    rows.append(('mse', 0, 0, mse))
    return emit(rows)


# ----------------------------------------------------------------- asy
def asy_epoch(samples, lr, reg, bias_reg):
    yf, hf = {}, {}
    mu = 0.0
    bu, bi = {}, {}
    loss = 0.0
    for u, item, rating in samples:
        prof = sorted(PROFILE[u])
        denom = math.sqrt(len(prof))
        acc = [0.0] * RANK
        for l in prof:
            yl = yf.setdefault(l, init_vec(l, 0))
            for f in range(RANK):
                acc[f] += yl[f]
        for f in range(RANK):
            acc[f] /= denom
        hi = hf.setdefault(item, init_vec(item, 1))
        pred = mu + bu.get(u, 0.0) + bi.get(item, 0.0)
        for f in range(RANK):
            pred += acc[f] * hi[f]
        err = rating - pred
        loss += err * err
        mu += lr * (err - bias_reg * mu)
        bu[u] = bu.get(u, 0.0) + lr * (err - bias_reg * bu.get(u, 0.0))
        bi[item] = bi.get(item, 0.0) + lr * (err - bias_reg * bi.get(item, 0.0))
        for l in prof:                       # Y vs the PRE-update H_i
            yl = yf[l]
            for g in range(RANK):
                yl[g] += lr * (err * hi[g] - reg * yl[g])
        for f in range(RANK):                # H vs the pre-update w_u
            hi[f] += lr * (err * acc[f] - reg * hi[f])
    mse = loss / len(samples)
    rows = []
    for l in sorted(yf):
        for f in range(RANK):
            rows.append(('y', l, f, yf[l][f]))
    for i in sorted(hf):
        for f in range(RANK):
            rows.append(('h', i, f, hf[i][f]))
    for u in sorted(bu):
        rows.append(('bu', u, 0, bu[u]))
    for i in sorted(bi):
        rows.append(('bi', i, 0, bi[i]))
    rows.append(('mu', 0, 0, mu))
    rows.append(('mse', 0, 0, mse))
    # W = URM.Y / sqrt(|profile|)  (user-factor estimation)
    for u in sorted(PROFILE):
        prof = sorted(PROFILE[u])
        acc = [0.0] * RANK
        for l in prof:
            if l in yf:
                for f in range(RANK):
                    acc[f] += yf[l][f]
        denom = math.sqrt(len(prof))
        for f in range(RANK):
            acc[f] /= denom
        for f in range(RANK):
            rows.append(('west', u, f, acc[f]))
    return emit(rows)


# ----------------------------------------------------------------- bpr
class Adaptive:
    def __init__(self, mode):
        self.mode = mode
        self.gamma, self.b1, self.b2 = 0.995, 0.9, 0.999
        self.b1p, self.b2p = 0.9, 0.999
        self.cache, self.m1, self.m2 = {}, {}, {}

    def arr(self, store, key):
        return store.setdefault(key, [0.0] * RANK)

    def update(self, kind, ident, f, g):
        k = (kind, ident)
        if self.mode == 'adagrad':
            c = self.arr(self.cache, k)
            c[f] += g * g
            return g / (math.sqrt(c[f]) + 1e-8)
        if self.mode == 'rmsprop':
            c = self.arr(self.cache, k)
            c[f] = c[f] * self.gamma + (1 - self.gamma) * g * g
            return g / (math.sqrt(c[f]) + 1e-8)
        if self.mode == 'adam':
            a = self.arr(self.m1, k)
            b = self.arr(self.m2, k)
            a[f] = a[f] * self.b1 + (1 - self.b1) * g
            b[f] = b[f] * self.b2 + (1 - self.b2) * g * g
            return (a[f] / (1 - self.b1p)) / (
                math.sqrt(b[f] / (1 - self.b2p)) + 1e-8)
        return g

    def advance(self):
        if self.mode == 'adam':
            self.b1p *= self.b1
            self.b2p *= self.b2


def bpr_epoch(triples, mode, lr, reg, neg_reg, user_reg, batch_size):
    uf, itf = {}, {}
    adapt = Adaptive(mode)
    for s0 in range(0, len(triples), batch_size):
        batch = triples[s0:s0 + batch_size]
        acc = OrderedDict()

        def acc_for(kind, ident):
            return acc.setdefault((kind, ident), [0.0] * RANK)

        for u, ipos, jneg in batch:
            wu = uf.setdefault(u, init_vec(u, 0))
            hi = itf.setdefault(ipos, init_vec(ipos, 1))
            hj = itf.setdefault(jneg, init_vec(jneg, 1))
            xuij = 0.0
            for f in range(RANK):
                xuij += wu[f] * (hi[f] - hj[f])
            sig = 1.0 / (1.0 + math.exp(xuij))
            au, ai, aj = acc_for(0, u), acc_for(1, ipos), acc_for(1, jneg)
            for f in range(RANK):
                ai[f] += sig * wu[f] - reg * hi[f]
                aj[f] += -sig * wu[f] - neg_reg * hj[f]
                au[f] += sig * (hi[f] - hj[f]) - user_reg * wu[f]
        for (kind, ident), g in acc.items():
            fvec = uf[ident] if kind == 0 else itf[ident]
            for f in range(RANK):
                fvec[f] += lr * adapt.update(kind, ident, f,
                                             g[f] / batch_size)
        adapt.advance()
    rows = []
    for u in sorted(uf):
        for f in range(RANK):
            rows.append(('w', u, f, uf[u][f]))
    for i in sorted(itf):
        for f in range(RANK):
            rows.append(('h', i, f, itf[i][f]))
    return emit(rows)


# ------------------------------------------------------------ slim bpr
def slim_epoch(triples, lr, li, lj):
    S = {}

    def row(t):
        return S.setdefault(t, {})

    for u, ipos, jneg in triples:
        prof = PROFILE[u]                    # URM declaration order
        si, sj = row(ipos), row(jneg)
        x = 0.0
        for l in prof:
            x += si.get(l, 0.0) - sj.get(l, 0.0)
        g = 1.0 / (1.0 + math.exp(x))
        for l in prof:
            if l != ipos:
                si[l] = si.get(l, 0.0) + lr * (g - li * si.get(l, 0.0))
            if l != jneg:
                sj[l] = sj.get(l, 0.0) - lr * (g - lj * sj.get(l, 0.0))
    # engine convention: (i = profile neighbor, j = scored target, w)
    out = []
    for t in sorted(S):
        for l in sorted(S[t]):
            w = S[t][l]
            if w != 0.0:
                out.append((l, t, r6(w)))
    return out


def sql_values(rows, cols):
    lines = []
    for idx, r in enumerate(rows):
        vals = []
        for j, v in enumerate(r):
            if isinstance(v, str):
                vals.append("'%s'" % v)
            elif isinstance(v, float):
                s = repr(v)
                if idx == 0 and j == len(r) - 1:
                    s = "CAST(%s AS DOUBLE)" % s
                vals.append(s)
            else:
                vals.append(str(v))
        lines.append("  (%s)" % ", ".join(vals))
    return ("SELECT * FROM (VALUES\n" + ",\n".join(lines) +
            "\n) t(%s)" % ", ".join(cols))


if __name__ == '__main__':
    funk_samples = [(0, 0, 1.0), (1, 3, 2.0), (0, 2, 0.0), (2, 0, 2.0)]
    print("=== q174 funk ===")
    print(sql_values(funk_epoch(funk_samples, lr=0.14, reg=0.05,
                                bias_reg=0.02),
                     ["kind", "id", "f", "value"]))

    asy_samples = [(0, 0, 1.0), (1, 2, 1.0), (0, 3, 0.0)]
    print("=== q176 asy ===")
    print(sql_values(asy_epoch(asy_samples, lr=0.14, reg=0.05,
                               bias_reg=0.02),
                     ["kind", "id", "f", "value"]))

    bpr_triples = [(0, 0, 2), (1, 1, 0), (0, 1, 2), (1, 2, 0)]
    print("=== q175 bpr ===")
    allrows = []
    for mode in ['sgd', 'adagrad', 'rmsprop', 'adam']:
        for r in bpr_epoch(bpr_triples, mode, lr=0.14, reg=0.05,
                           neg_reg=0.03, user_reg=0.02, batch_size=2):
            allrows.append((mode,) + r)
    print(sql_values(allrows, ["mode", "kind", "id", "f", "value"]))

    slim_triples = [(0, 0, 2), (1, 1, 0), (0, 1, 3), (2, 0, 1)]
    print("=== q177 slim ===")
    print(sql_values(slim_epoch(slim_triples, lr=0.14, li=0.05, lj=0.03),
                     ["i", "j", "w"]))

    margins.sort()
    print("=== min margins from 6-decimal rounding boundary ===")
    for m, v in margins[:5]:
        print("margin %.3e at value %r" % (m, v))

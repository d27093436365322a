#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]
Set CHECK_STRICT=1 to compare floats bit-exactly (no rounding) —
all oracle queries are engineered to pass even this.

Reads each <out_dir>/<name> parquet (Spark result), runs the matching
oracle SQL from <out_dir>/oracle_sql.json in DuckDB over the same
parquet tables, and compares: column names (sorted), row counts, and
values (rows sorted, tolerant float compare + exact hash report).
"""
import json, sys, math, glob, os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

STRICT = os.environ.get("CHECK_STRICT") == "1"

def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v) if STRICT else round(v, 6)
    if hasattr(v, "item"):  # numpy scalar
        try:
            v = v.item()
        except Exception:
            pass
        if isinstance(v, float):
            return repr(v) if STRICT else round(v, 6)
    if isinstance(v, (list, tuple)) or v.__class__.__name__ == "ndarray":
        return tuple(norm_cell(x) for x in v)
    return v

def frame_key(df):
    cols = sorted(df.columns)
    rows = []
    for row in df[cols].itertuples(index=False, name=None):
        rows.append(tuple(norm_cell(v) for v in row))
    rows.sort(key=repr)
    return cols, rows

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    names = sorted(oracle) if not only else [n for n in sorted(oracle) if n in only]
    for name in names:
        spark_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_glob:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in spark_glob])
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        gc, gr = frame_key(got)
        wc, wr = frame_key(want)
        if gc != wc:
            print(f"FAIL {name}: columns spark={gc} duckdb={wc}")
            n_fail += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows spark={len(gr)} duckdb={len(wr)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(gr, wr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(gr)} rows differ; first: "
                  f"spark={bad[0][0]} duckdb={bad[0][1]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(gr)} rows, {len(gc)} cols)")
        n_pass += 1
    # queries with no oracle → rows-only check
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle and (not only or name in only):
            files = glob.glob(os.path.join(p, "*.parquet"))
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"{'ROWS' if n > 0 else 'FAIL'} {name}: {n} rows (no oracle)")
            if n == 0:
                n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

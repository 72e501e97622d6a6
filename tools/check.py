#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB differential oracle (dev-only tool;
NOT part of the shipped Scala library).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each table in <sfDir> as a
DuckDB view under its bare name, runs every oracle SQL, and compares against
the Spark-written parquet in <verifyOutDir>/<query>/ — columns sorted by
name, row order preserved, exact value equality (NaN==NaN, None==None).
"""
import json, math, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return "[" + ",".join(norm(x) for x in v.tolist()) + "]"
        if isinstance(v, np.generic):
            return norm(v.item())
    except ImportError:
        pass
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            ddf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        dcols, scols = sorted(ddf.columns), sorted(sdf.columns)
        if dcols != scols:
            print(f"FAIL {name}: columns duck={dcols} spark={scols}")
            n_fail += 1
            continue
        if len(ddf) != len(sdf):
            print(f"FAIL {name}: rows duck={len(ddf)} spark={len(sdf)}")
            n_fail += 1
            continue
        bad = None
        for c in dcols:
            dv = [norm(x) for x in ddf[c].tolist()]
            sv = [norm(x) for x in sdf[c].tolist()]
            if dv != sv:
                i = next(i for i in range(len(dv)) if dv[i] != sv[i])
                bad = f"col {c} row {i}: duck={dv[i]} spark={sv[i]}"
                break
        if bad:
            print(f"FAIL {name}: {bad}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(ddf)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

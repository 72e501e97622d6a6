#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB differential oracle (dev-only tool;
NOT part of the shipped Scala library).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each table in <sfDir> as a
DuckDB view under its bare name, runs every oracle SQL, and compares against
the Spark-written parquet in <verifyOutDir>/<query>/.

Round-1 lesson: this mirror used to read the SPARK side back through DuckDB,
which silently coerced DECIMAL->DOUBLE and tolerated array cells — so it said
22/22 pass while the driver failed 4. The driver reads the Spark parquet with
pyarrow/pandas and sorts rows with DataFrame.sort_values, so this mirror now
does exactly that: pyarrow read, dtype-kind comparison, and a sort_values
dry-run that fails on anything pandas cannot hash (arrays, Decimals).
"""
import json, math, sys, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if v is None:
        return "None"
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


def dtype_kind(dt):
    # compare dtype *kinds* (i/u -> int, f -> float, M -> ts, O -> object);
    # exact dtypes differ benignly across readers (datetime64[us] vs [ns]).
    k = dt.kind
    return {"i": "int", "u": "int", "f": "float", "M": "ts", "b": "bool"}.get(k, "obj")


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
        # read the SPARK side the way the driver does: pyarrow -> pandas
        try:
            sdf = pq.read_table(files).to_pandas()
        except Exception as e:
            print(f"FAIL {name}: pyarrow read error: {e}")
            n_fail += 1
            continue
        dcols, scols = sorted(ddf.columns), sorted(sdf.columns)
        if dcols != scols:
            print(f"FAIL {name}: columns duck={dcols} spark={scols}")
            n_fail += 1
            continue
        if len(ddf) != len(sdf):
            print(f"FAIL {name}: rows duck={len(ddf)} spark={len(sdf)}")
            n_fail += 1
            continue
        # dtype-kind parity (catches Spark DECIMAL output: object vs float)
        bad = None
        for c in dcols:
            dk, sk = dtype_kind(ddf[c].dtype), dtype_kind(sdf[c].dtype)
            if dk != sk:
                bad = f"dtype col {c}: duck={ddf[c].dtype}({dk}) spark={sdf[c].dtype}({sk})"
                break
        if bad:
            print(f"FAIL {name}: {bad}")
            n_fail += 1
            continue
        # emulate the driver's sort-before-compare (crashes on unhashable
        # cells). sort_values is NOT in-place — assign the results, else the
        # value compare below runs in file order and repartition(1) output
        # (no ordering guarantee) would spuriously FAIL.
        try:
            sdf = sdf.sort_values(scols).reset_index(drop=True)
            ddf = ddf.sort_values(dcols).reset_index(drop=True)
        except Exception as e:
            print(f"FAIL {name}: driver-style sort_values crashed: {e}")
            n_fail += 1
            continue
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

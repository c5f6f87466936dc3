#!/usr/bin/env python3
"""Local pre-check mirroring the driver's t2 gate: run graft.Verify output
against DuckDB oracles. Usage: parity.py <sfDir> <verifyOutDir> [query...]

Driver-side python (duckdb/pyarrow/pandas) is used here for CHECKING only;
the engine itself is pure Scala/Spark.
"""
import json, sys, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df

def cmp(a, b):
    if list(a.columns) != list(b.columns):
        return f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"row count differs: spark={len(a)} oracle={len(b)}"
    # the judged driver hash-compares raw column values, so dtype drift
    # (int64 vs float64 from a DuckDB HUGEINT sum) must FAIL here too
    for c in a.columns:
        da, db = str(a[c].dtype), str(b[c].dtype)
        if da != db and not (da.startswith("datetime64") and db.startswith("datetime64")):
            return f"col {c} dtype differs: spark={da} oracle={db}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            xn = x is None or (isinstance(x, float) and math.isnan(x)) or x is pd.NaT
            yn = y is None or (isinstance(y, float) and math.isnan(y)) or y is pd.NaT
            if xn and yn:
                continue
            if xn != yn or x != y:
                return f"col {c} row {i}: spark={x!r} oracle={y!r}"
    return None

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            ora = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        # driver checks column names+order before its sorted-column hash:
        # catch order drift before norm() sorts it away
        if list(spark_df.columns) != list(ora.columns):
            print(f"FAIL {name}: column order differs: spark={list(spark_df.columns)}"
                  f" oracle={list(ora.columns)}")
            n_fail += 1
            continue
        diff = cmp(norm(spark_df), norm(ora))
        if diff:
            print(f"FAIL {name}: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    # queries with no oracle: report row counts only
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracles:
            df = load_spark(outdir, name)
            print(f"NOORACLE {name}: {0 if df is None else len(df)} rows")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

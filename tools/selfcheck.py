#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching oracle_sql.json entry in DuckDB over the <sfDir> tables, sorts
columns by name and rows by all columns, and compares values exactly
(decimals as strings, doubles bit-exact, NaN==NaN).
"""
import sys, json, glob, math, decimal, datetime

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v.hex()
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def norm_df(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sfdir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            ddf = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        scols, srows = norm_df(sdf)
        dcols, drows = norm_df(ddf)
        if scols != dcols:
            print(f"FAIL {name}: cols spark={scols} duck={dcols}")
            n_fail += 1
        elif srows != drows:
            n_fail += 1
            diff = [(a, b) for a, b in zip(srows, drows) if a != b]
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)} "
                  f"first-diff={diff[0] if diff else (srows[-1], drows[-1] if drows else None)}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(srows)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

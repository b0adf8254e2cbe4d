#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfdir> <verify_out_dir>

Loads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sfdir
tables, sorts columns by name + rows by all columns, and compares
values (with a small float tolerance report as well as exact match).
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        mine = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            results[name] = f"ROWS_ONLY ({len(mine)} rows)"
            continue
        try:
            ref = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        a, b = canon(mine), canon(ref)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA_MISMATCH mine={list(a.columns)} ref={list(b.columns)}"
            continue
        if len(a) != len(b):
            results[name] = f"ROWCOUNT_MISMATCH mine={len(a)} ref={len(b)}"
            continue
        # type-strict like the driver's hash: a HUGEINT (-> float64/object)
        # vs Spark int64 must fail even when values are equal (p4_shards r2).
        kinds_a = [a[c].dtype.kind for c in a.columns]
        kinds_b = [b[c].dtype.kind for c in b.columns]
        if kinds_a != kinds_b:
            bad = [c for c in a.columns if a[c].dtype.kind != b[c].dtype.kind]
            results[name] = (f"TYPE_MISMATCH cols={bad} "
                             f"mine={[str(a[c].dtype) for c in bad]} "
                             f"ref={[str(b[c].dtype) for c in bad]}")
            continue
        # exact compare with NaN==NaN; report first diff
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            results[name] = "OK"
        except AssertionError as e:
            # find offending cols
            bad = []
            for c in a.columns:
                try:
                    pd.testing.assert_series_equal(a[c], b[c], check_dtype=False, check_exact=True)
                except AssertionError:
                    bad.append(c)
            results[name] = f"VALUE_MISMATCH cols={bad}: {str(e).splitlines()[-1][:200]}"
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        print(f"{k:16s} {v}")
    print(f"\n{ok}/{len([v for v in results.values() if 'ROWS_ONLY' not in v])} oracle-checked OK; "
          f"{len(results)} total")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

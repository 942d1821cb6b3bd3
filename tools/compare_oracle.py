#!/usr/bin/env python3
"""Dev-only harness (NOT part of the library): local replica of the
correctness gate's DuckDB oracle compare, for pre-commit checking of new
queries/oracleSql pairs.

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/compare_oracle.py /tmp/verify_out /root/testdata/sf0.01 [query ...]

Loads each <out>/<name> spark parquet and runs oracle_sql.json[name] in
DuckDB over views of the sf tables; sorts columns by name, rows by all
columns, and compares values (the same canonicalization the gate uses).
Requires duckdb + pandas (present in the dev environment's python, not a
build dependency).
"""
import sys, json, glob, os
import duckdb, pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def main():
    out, sf = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    for name in sorted(os.listdir(out)):
        d = os.path.join(out, name)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").df()
        except Exception as e:
            results[name] = f"SPARK-READ-ERR {e}"
            continue
        if name not in oracle:
            results[name] = f"no_oracle rows={len(spark_df)}"
            continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-ERR {type(e).__name__}: {e}"
            continue
        try:
            a, b = canon(spark_df), canon(odf)
        except Exception as e:
            results[name] = f"SORT-ERR {type(e).__name__}: {e}"
            continue
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(a.columns)} oracle={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWS-MISMATCH spark={len(a)} oracle={len(b)}"
        else:
            # value compare with float tolerance-free exactness like a hash
            try:
                same = a.astype(str).equals(b.astype(str))
            except Exception as e:
                results[name] = f"HASH-ERR {type(e).__name__}: {e}"
                continue
            results[name] = "OK" if same else "HASH-MISMATCH"
    bad = 0
    for k, v in results.items():
        flag = "" if v == "OK" or v.startswith("no_oracle") else " <<<<"
        if flag: bad += 1
        print(f"{k:32s} {v}{flag}")
    print(f"\n{len(results)} queries, {bad} problems")
    sys.exit(1 if bad else 0)

main()

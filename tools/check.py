#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each oracle SQL from oracle_sql.json in DuckDB against the testdata
parquet tables, reads the Spark result parquet written by graft.Verify,
and compares: schema (column names sorted), row count, and exact values
(columns sorted by name, rows sorted by all columns).

Usage:
  sbt 'runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out'
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list:
    problems = []
    scols, ocols = sorted(spark_df.columns), sorted(oracle_df.columns)
    if scols != ocols:
        problems.append(f"schema: spark={scols} oracle={ocols}")
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"rows: spark={len(spark_df)} oracle={len(oracle_df)}")
        return problems
    s, o = canon(spark_df), canon(oracle_df)
    for c in s.columns:
        sv, ov = s[c], o[c]
        try:
            eq = (sv == ov) | (sv.isna() & ov.isna())
        except Exception as e:
            problems.append(f"col {c}: compare error {e} (dtypes {sv.dtype} vs {ov.dtype})")
            continue
        if not eq.all():
            bad = (~eq).idxmax()
            n_bad = int((~eq).sum())
            problems.append(
                f"col {c}: {n_bad} mismatches, first at row {bad}: "
                f"spark={sv.iloc[bad]!r} oracle={ov.iloc[bad]!r} "
                f"(dtypes {sv.dtype} vs {ov.dtype})")
    return problems


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    only = sys.argv[3:] or None
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            failures += 1
            continue
        try:
            oracle_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        problems = compare(name, spark_df, oracle_df)
        if problems:
            failures += 1
            print(f"FAIL {name}:")
            for p in problems:
                print(f"  - {p}")
        else:
            print(f"ok   {name}: {len(spark_df)} rows, {len(spark_df.columns)} cols")
    print(f"\n{len(oracles) - failures}/{len(oracles)} green")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

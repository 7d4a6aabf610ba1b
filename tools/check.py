#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate (NOT engine code —
the engine is Scala-only; this mirrors how the driver compares Verify
output against DuckDB oracle SQL so we can iterate before the round runs).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # datetimes -> canonical string at microsecond precision
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.floor("us").astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: v.tolist() if hasattr(v, "tolist") else v).astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            expected = con.sql(sql).df()
            actual = pd.read_parquet(f"{out_dir}/{name}")
            e, a = normalize(expected), normalize(actual)
            if list(e.columns) != list(a.columns):
                print(f"FAIL {name}: columns {list(a.columns)} != {list(e.columns)}")
                n_fail += 1
            elif len(e) != len(a):
                print(f"FAIL {name}: rows {len(a)} != {len(e)}")
                n_fail += 1
            elif not e.equals(a):
                neq = (e != a).any(axis=1)
                idx = neq[neq].index[:3]
                print(f"FAIL {name}: value mismatch at rows {list(idx)}")
                for i in idx:
                    print(f"  oracle: {e.loc[i].to_dict()}")
                    print(f"  spark : {a.loc[i].to_dict()}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(a)} rows)")
                n_pass += 1
        except Exception as ex:
            print(f"FAIL {name}: {type(ex).__name__}: {ex}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

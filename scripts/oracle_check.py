#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(sbt -batch "runMain graft.Verify <sfDir> <outDir>"), then this script
compares each dumped parquet against its DuckDB oracle SQL.

Usage: python3 scripts/oracle_check.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in spark_files]))
        want = canon(con.sql(sql).df())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        eq = got.equals(want)
        if not eq:
            # find first differing cell for diagnostics
            diff = (got != want) & ~(got.isna() & want.isna())
            cells = diff.to_numpy().nonzero()
            msg = ""
            if len(cells[0]):
                r, c = cells[0][0], cells[1][0]
                colname = got.columns[c]
                msg = f" first diff row {r} col {colname}: {got.iloc[r, c]!r} vs {want.iloc[r, c]!r}"
            print(f"FAIL {name}: values differ{msg}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {len(oracle) - failures}/{len(oracle)} oracle queries match")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

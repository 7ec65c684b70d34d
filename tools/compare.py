#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
outputs against the DuckDB oracle SQL and compare (schema + sorted-row
values). Usage: compare.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return repr(round(v, 9))
    if isinstance(v, (int, bool, str)):
        return v
    return str(v)


def frame_to_rows(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(canon(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        # partial dumps (SPARK_GRAFT_ONLY=...) only write some queries
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            duck_df = con.execute(sql).df()
            sc, sr = frame_to_rows(spark_df)
            dc, dr = frame_to_rows(duck_df)
            if sc != dc:
                print(f"FAIL {name}: columns differ\n  spark={sc}\n  duck ={dc}")
                n_fail += 1
                continue
            # dtype check (approximate driver's schema match)
            sdt = list(spark_df[sorted(spark_df.columns)].dtypes)
            ddt = list(duck_df[sorted(duck_df.columns)].dtypes)
            if [str(x) for x in sdt] != [str(x) for x in ddt]:
                print(f"WARN {name}: dtypes differ spark={sdt} duck={ddt}")
            if sr == dr:
                print(f"PASS {name} ({len(sr)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: rows differ "
                      f"(spark {len(sr)} vs duck {len(dr)})")
                diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
                for a, b in diffs:
                    print(f"  spark: {a}\n  duck : {b}")
                if len(sr) != len(dr):
                    only_s = set(sr) - set(dr)
                    only_d = set(dr) - set(sr)
                    for r in list(only_s)[:3]:
                        print(f"  only-spark: {r}")
                    for r in list(only_d)[:3]:
                        print(f"  only-duck : {r}")
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {e}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

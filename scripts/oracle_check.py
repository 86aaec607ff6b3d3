#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness check.

Usage:  python3 scripts/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB against
views over <sfDir>/*.parquet, and compares values with columns sorted by
name and rows sorted canonically. Dev-only tooling — the shipped Scala
engine never depends on this.
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return ("\x00",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    return (str(type(v).__name__), str(v))


def frame_rows(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(canon(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{qdir}/*.parquet'").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        sc, sr = frame_rows(spark_df)
        dc, dr = frame_rows(duck_df)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            n_fail += 1
        elif sr != dr:
            bad = next(i for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
            print(f"FAIL {name}: first diff at sorted row {bad}:")
            print(f"  cols : {sc}")
            print(f"  spark: {sr[bad]}")
            print(f"  duck : {dr[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

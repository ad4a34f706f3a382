#!/usr/bin/env python
"""Local stand-in for the driver's CORRECTNESS gate: run each __spark_entry__
query AND its DuckDB oracle side-by-side at a given sf dir, compare row
count, schema (column names), and a value hash over name-sorted columns.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def value_hash(df) -> str:
    """Hash of the name-sorted-column, row-sorted values (pandas frame)."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(tuple(repr(v) for v in r) for r in df.itertuples(index=False))
    h = hashlib.md5()
    for r in rows:
        h.update("|".join(r).encode())
    return h.hexdigest()


def main() -> None:
    import duckdb

    import __spark_entry__ as entry
    from patapsco_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, oracles = entry.queries(), entry.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name}: no_oracle rows={len(sdf)}")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        ok_rows = len(sdf) == len(odf)
        ok_schema = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_schema and value_hash(sdf) == value_hash(odf)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            fails.append(name)
        print(f"{name}: {status} rows {len(sdf)}/{len(odf)} "
              f"schema={ok_schema} hash={ok_hash}")
    spark.stop()
    if fails:
        print("FAILED:", fails)
        sys.exit(1)


if __name__ == "__main__":
    main()

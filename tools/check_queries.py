#!/usr/bin/env python
"""Targeted parity check: run named registry queries (or prefixes)
against their DuckDB oracles, driver-style. Faster feedback than the
full driver_sim during development.

Usage: python tools/check_queries.py <name-or-prefix> [...] [--sf DIR]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _canon(v) -> str:
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return str(v)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2:]

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .appName("check-queries")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = [n for n in queries if any(n == a or n.startswith(a) for a in args)]
    if not names:
        print(f"no queries match {args}")
        return 2

    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    rc = 0
    for name in names:
        try:
            sdf = queries[name](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"ROWS {name} rows={len(s_rows)}")
                continue
            res = duck.execute(oracles[name])
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
            so = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            do = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            sn = sorted(tuple(_canon(r[i]) for i in so) for r in s_rows)
            dn = sorted(tuple(_canon(r[i]) for i in do) for r in d_rows)
            if sorted(s_cols) == sorted(d_cols) and sn == dn:
                print(f"PASS {name} rows={len(s_rows)}")
            else:
                rc = 1
                print(f"FAIL {name} cols_ok={sorted(s_cols) == sorted(d_cols)}"
                      f" s={len(s_rows)} d={len(d_rows)}")
                for a, b in list(zip(sn, dn))[:3]:
                    if a != b:
                        print(f"  spark={a}\n  duck ={b}")
        except Exception as ex:  # noqa: BLE001
            rc = 1
            print(f"ERR  {name}: {str(ex)[:300]}")
    print("done")
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())

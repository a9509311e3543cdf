#!/usr/bin/env python
"""Simulate the round driver's correctness gate locally.

Builds a BARE SparkSession (none of session.py's confs — exactly the
driver's situation), runs every registry query through the
__spark_entry__ contract at the given sf_dir, and hash-compares each
oracled query against DuckDB the way the driver does (columns sorted
by name, stringified cells, row-order-insensitive).

Round 1 shipped 16 queries that passed pytest but errored in the
driver's own session (the events.parquet nanos footer); this tool
exists so that class of bug can't ship again.

Usage: python tools/driver_sim.py [sf_dir] [limit]
       (default /root/testdata/sf0.01, all queries)
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    limit = int(sys.argv[2]) if len(sys.argv) > 2 else None

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        # Endurance dials, NOT semantics: a 185+-query sweep in one
        # default-heap JVM dies on UI/status-store residue alone (the
        # SQL tab retains up to 1000 executions' full plan graphs).
        # The real driver runs 50 queries; these confs keep the sweep
        # measuring ENGINE leaks, not harness bookkeeping.
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ui.retainedExecutions", "8")
        .config("spark.ui.retainedJobs", "50")
        .config("spark.ui.retainedStages", "50")
        # Heap telemetry (DRIVER_SIM_HEAP_LOG) shows the engine holds
        # <200 MiB residual after 90 queries (rdds=0, views=0), but a
        # 1 GiB default heap with 1 MiB G1 regions dies on HUMONGOUS
        # 1 MiB task allocations (GCLocker retry exhaustion) when 16
        # sf0.1 percentile tasks land on a session fragmented by 90
        # prior queries. Sizing the driver is deployment hygiene, not
        # leak masking — the telemetry above is the leak evidence.
        .config("spark.driver.memory", "4g")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    def _persistent_ids():
        jsc = spark.sparkContext._jsc
        return {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}

    def _release_query_leftovers(before_ids, before_views):
        """Harness-side lifetime management: the engine hands back
        results as eager localCheckpoints (the CALLER owns them) and
        streaming queries leave memory-sink tables; a 185-query
        session must release both per query or the driver heap
        accumulates until the JVM dies (observed at sf0.1 ~92 queries
        in). The real driver runs 50 queries at sf0.01 and never gets
        near this; the sweep is an endurance harness."""
        jsc = spark.sparkContext._jsc
        m = jsc.getPersistentRDDs()
        for rid in _persistent_ids() - before_ids:
            r = m.get(rid)
            if r is not None:
                r.unpersist()
        for v in set(_temp_views()) - before_views:
            spark.catalog.dropTempView(v)

    def _temp_views():
        return [
            t.name
            for t in spark.catalog.listTables()
            if t.tableType == "TEMPORARY" or t.isTemporary
        ]

    names = list(queries)[:limit] if limit else list(queries)
    n_pass = n_fail = n_rowsonly = 0
    for qi, name in enumerate(names):
        ids0, views0 = _persistent_ids(), set(_temp_views())
        if qi % 20 == 19:
            # py4j releases JVM bindings only after PYTHON gc; then a
            # JVM gc lets ContextCleaner reap broadcasts/shuffles
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
        if qi % 10 == 9 and os.environ.get("DRIVER_SIM_HEAP_LOG"):
            rt = spark.sparkContext._jvm.Runtime.getRuntime()
            used = (rt.totalMemory() - rt.freeMemory()) // (1 << 20)
            print(
                f"HEAP q={qi} used={used}MiB max={rt.maxMemory() >> 20}MiB"
                f" rdds={len(_persistent_ids())} views={len(_temp_views())}",
                flush=True,
            )
        try:
            sdf = queries[name](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            del sdf
            _release_query_leftovers(ids0, views0)
            if name not in oracles:
                n_rowsonly += 1
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
                n_pass += 1
                print(f"PASS {name} rows={len(s_rows)}")
            else:
                n_fail += 1
                print(f"FAIL {name} cols={sorted(s_cols) == sorted(d_cols)}"
                      f" s={len(s_rows)} d={len(d_rows)}")
        except Exception as ex:  # noqa: BLE001 — report, keep going
            n_fail += 1
            print(f"ERR  {name}: {str(ex)[:160]}")
            try:
                _release_query_leftovers(ids0, views0)
            except Exception:  # noqa: BLE001 — cleanup is best-effort
                pass
    print(f"\nTOTAL pass={n_pass} fail={n_fail} rows_only={n_rowsonly}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

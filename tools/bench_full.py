#!/usr/bin/env python
"""Full-registry bench sweep: time EVERY registered query once and
write a per-query sidecar (default ./bench_full.json).

This closes the r8 verdict's bench blind spot: bench.py times only
the ~60 headline queries, so a perf regression in any of the other
~190 registered queries was invisible to tools/bench_diff.py. This
sweep is a DIFFERENT, clearly-labeled protocol from the headline
sidecar:

- ONE timed sample per query, NO per-query warmup (a medians-of-5
  pass over 245+ queries would run for an hour; this is a smoke-level
  regression tripwire, not a steady-state throughput statistic);
- diffs of this sidecar therefore need a LOOSER threshold —
  tools/bench_diff.py --full uses 2.5x by default (vs 1.5x for the
  median-of-5 headline sidecar) and a higher noise floor;
- per-query leftovers (persisted frames, memory-sink tables) are
  released after each query, as in tools/driver_sim.py, so the sweep
  measures queries, not accumulated session residue.

Usage: python tools/bench_full.py [sf_dir]
       (default $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1;
        sidecar path override: $SPARK_GRAFT_BENCH_FULL)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    from workshop3_etl_spark.plans import registry
    from workshop3_etl_spark.session import get_spark

    spark = get_spark(app_name="bench-full")
    spark.sparkContext.setLogLevel("ERROR")

    t_setup0 = time.perf_counter()
    # No base-table cache: the round-10 optimization rules class any
    # persist of base tables outside the timed region as result
    # pre-computation (see bench.py / OPTIMIZATION_r10.md); every
    # timed sample computes from the parquet inputs.
    # global (not per-query) warmups: noop writer + codegen, and the
    # streaming engine's one-time class loading (see bench.py)
    spark.range(1000).selectExpr("sum(id) as s").write.format(
        "noop"
    ).mode("overwrite").save()
    import tempfile

    with tempfile.TemporaryDirectory() as _ckpt:
        (
            spark.readStream.format("rate").option("rowsPerSecond", "1")
            .load()
            .groupBy()
            .count()
            .writeStream.format("memory")
            .queryName("_warm_stream")
            .outputMode("complete")
            .option("checkpointLocation", _ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    setup_sec = round(time.perf_counter() - t_setup0, 4)

    def _persistent_ids():
        jsc = spark.sparkContext._jsc
        return {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}

    def _temp_views():
        return [
            t.name
            for t in spark.catalog.listTables()
            if t.tableType == "TEMPORARY" or t.isTemporary
        ]

    def _release(before_ids, before_views):
        jsc = spark.sparkContext._jsc
        m = jsc.getPersistentRDDs()
        for rid in _persistent_ids() - before_ids:
            r = m.get(rid)
            if r is not None:
                r.unpersist()
        for v in set(_temp_views()) - before_views:
            spark.catalog.dropTempView(v)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    t_loop0 = time.perf_counter()
    for qi, (name, fn) in enumerate(registry.queries().items()):
        ids0, views0 = _persistent_ids(), set(_temp_views())
        if qi % 20 == 19:
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
        try:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.perf_counter() - t0, 4)
            print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            errors[name] = str(ex)[:200]
            print(f"# ERR {name}: {errors[name]}", file=sys.stderr)
        finally:
            try:
                _release(ids0, views0)
            except Exception:  # noqa: BLE001 — cleanup is best-effort
                pass
    loop_wall = round(time.perf_counter() - t_loop0, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "", 1).isdigit() else sf
    out = os.path.abspath(
        os.environ.get("SPARK_GRAFT_BENCH_FULL", "bench_full.json")
    )
    with open(out, "w", encoding="utf-8") as f:
        json.dump(
            {
                "metric": "full_registry_wall_time",
                "protocol": "single_sample_no_warmup",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "n_queries": len(timings),
                "queries": timings,
                "classes": registry.perf_classes(),
                "errors": errors,
                "setup_sec": setup_sec,
                "loop_wall_sec": loop_wall,
                "sf": sf_val,
            },
            f,
        )
    print(
        json.dumps(
            {
                "metric": "full_registry_wall_time",
                "value": round(sum(timings.values()), 4),
                "n_queries": len(timings),
                "n_errors": len(errors),
                "sf": sf_val,
                "detail_file": out,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Stage-level triage for the r11 targets: time each sub-frame of a
chain with the noop sink in one session (guide §1: isolate, label).
Triage only — keep/revert decisions still use interleaved A/B via
tools/bench_one.py.

Usage: python tools/probe_stages.py <probe> [...]   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _t(spark, label, df, n=3):
    spark.sparkContext.setJobDescription(label)
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"  {label}: " + " ".join(f"{r:.3f}" for r in runs), flush=True)


def probe_subruns(spark):
    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators import dedup as D
    from workshop3_etl_spark.sources.tables import load_table

    print("== substring-runs chain ==", flush=True)
    docs = load_table(spark, SF, "documents")
    seeds = D.substring_run_seeds(docs)
    _t(spark, "seeds map (bare scan)", seeds)
    from workshop3_etl_spark.sources.tables import scan_parallel

    seeds_p = D.substring_run_seeds(scan_parallel(spark, SF, "documents"))
    _t(spark, "seeds map (scan_parallel)", seeds_p)
    hot = (
        seeds.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > D.CAP_SUBRUN)
    )
    _t(spark, "hot agg", hot)
    capped = seeds.join(hot, "h", "left_anti")
    _t(spark, "capped anti-join", capped)
    a = capped.select(F.col("doc_id").alias("doc_a"), F.col("pos").alias("p1"), "h")
    b = capped.select(F.col("doc_id").alias("doc_b"), F.col("pos").alias("p2"), "h")
    pairs = (
        a.join(b, "h").filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "p1", "p2", (F.col("p1") - F.col("p2")).alias("diag"))
    )
    _t(spark, "pairs join", pairs)
    print("  pairs count:", pairs.count(), flush=True)
    runs, s = D.substring_runs_frame(docs)
    _t(spark, "full runs frame", runs)
    s.unpersist()


def probe_neardup(spark):
    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators import similarity as S
    from workshop3_etl_spark.sources.tables import load_table

    print("== sim_neardup_lsh_buckets ==", flush=True)
    emb = load_table(spark, SF, "embeddings")
    from workshop3_etl_spark.operators.similarity import (
        _rad_dot_spark,
        _rad_plane,
        _RAD_BITS,
        _RAD_SUB_BITS,
        _RAD_TABLES,
        dot_fold,
    )

    v = emb.select(
        "vec_id", "label", F.col("embedding").alias("ev"),
        dot_fold("embedding", "embedding").alias("nrm"),
    )

    def _bits(t, h0, h1):
        return F.concat(*[
            F.when(F.expr(_rad_dot_spark("ev", _rad_plane(t, h))) >= 0, "1")
            .otherwise("0") for h in range(h0, h1)
        ])

    buckets = F.array(*[
        F.struct(
            _bits(t, 0, _RAD_BITS).alias("b"),
            _bits(t, _RAD_BITS, _RAD_BITS + _RAD_SUB_BITS).alias("s"),
            F.expr(_rad_dot_spark("ev", _rad_plane(t, _RAD_BITS + _RAD_SUB_BITS))).alias("proj"),
        ) for t in range(_RAD_TABLES)
    ])
    sig_raw = v.select("vec_id", F.posexplode(buckets).alias("table_id", "bs"))
    _t(spark, "sig fold pass (bare)", sig_raw)
    from workshop3_etl_spark.sources.tables import scan_parallel

    emb_p = scan_parallel(spark, SF, "embeddings")
    v_p = emb_p.select(
        "vec_id", "label", F.col("embedding").alias("ev"),
        dot_fold("embedding", "embedding").alias("nrm"),
    )
    sig_raw_p = v_p.select("vec_id", F.posexplode(buckets).alias("table_id", "bs"))
    _t(spark, "sig fold pass (scan_parallel)", sig_raw_p)
    import time as _time

    t0 = _time.perf_counter()
    res, sig = S._neardup_lsh_plan(spark, SF)
    t_build = _time.perf_counter() - t0
    spark.sparkContext.setJobDescription("neardup: rerank after index")
    t0 = _time.perf_counter()
    res.write.format("noop").mode("overwrite").save()
    t_rerank = _time.perf_counter() - t0
    print(f"  plan build+sig materialize: {t_build:.3f}  rerank: {t_rerank:.3f}", flush=True)
    sig.unpersist()


def probe_happiness(spark):
    print("== happiness_unified_profile ==", flush=True)
    from workshop3_etl_spark.plans import registry

    fn = registry.queries()["happiness_unified_profile"]
    for k in range(4):
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        print(f"  full run[{k}]: {time.perf_counter() - t0:.3f}", flush=True)


def probe_zonemap(spark):
    print("== layout_zonemap_prune_stats ==", flush=True)
    from workshop3_etl_spark.plans import registry

    fn = registry.queries()["layout_zonemap_prune_stats"]
    for k in range(4):
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        print(f"  full run[{k}]: {time.perf_counter() - t0:.3f}", flush=True)


PROBES = {
    "subruns": probe_subruns,
    "neardup": probe_neardup,
    "happiness": probe_happiness,
    "zonemap": probe_zonemap,
}


def main() -> int:
    from workshop3_etl_spark.session import get_spark

    spark = get_spark(app_name="probe_stages")
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        PROBES[n](spark)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

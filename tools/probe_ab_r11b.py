#!/usr/bin/env python
"""Interleaved A/B, batch 2: semantic-dedup argmin restructure,
neardup + substring-runs scan_parallel retries (post-restructure /
more rounds than r10). OLD arms reconstructed inline or via loader
monkeypatch in the same session."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "4"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def ab(spark, name, old_fn, new_fn):
    _noop(old_fn(spark, SF))
    _noop(new_fn(spark, SF))
    olds, news = [], []
    for _ in range(ROUNDS):
        spark.sparkContext.setJobDescription(f"A(old): {name}")
        t0 = time.perf_counter()
        _noop(old_fn(spark, SF))
        olds.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(f"B(new): {name}")
        t0 = time.perf_counter()
        _noop(new_fn(spark, SF))
        news.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(
        f"{name}: old=" + "/".join(f"{v:.2f}" for v in olds)
        + " new=" + "/".join(f"{v:.2f}" for v in news),
        flush=True,
    )


def old_semdedup(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from workshop3_etl_spark.functions.cache import materialize_and_release
    from workshop3_etl_spark.operators.similarity import (
        _SEM_CAP,
        _SEM_TAU,
        _ivf_cells_df,
        dot_fold,
    )
    from workshop3_etl_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        F.col("embedding").alias("ev"),
        dot_fold("embedding", "embedding").alias("nrm"),
    ).persist()
    scored = v.crossJoin(F.broadcast(_ivf_cells_df(spark))).select(
        "vec_id", "ev", "nrm", "cell",
        (F.col("cc") - 2 * dot_fold("ev", "centroid")).alias("adist"),
    )
    wv = Window.partitionBy("vec_id").orderBy(F.asc("adist"), F.asc("cell"))
    m = (
        scored.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id", "ev", "nrm", "cell",
            (F.col("nrm") + F.col("adist")).alias("pd2"),
        )
    )
    wc = Window.partitionBy("cell").orderBy(F.desc("pd2"), F.asc("vec_id"))
    ch = (
        m.withColumn("rnk", F.row_number().over(wc))
        .withColumn("chunk", F.expr(f"(rnk - 1) div {_SEM_CAP}"))
        .persist()
    )
    a = ch.alias("a")
    b = ch.alias("b")
    cos = (
        F.expr(
            "aggregate(zip_with(a.ev, b.ev,"
            " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        / (F.sqrt(F.col("a.nrm")) * F.sqrt(F.col("b.nrm")))
    )
    dom = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.rnk") < F.col("b.rnk")),
        )
        .filter(cos >= F.expr(_SEM_TAU))
        .select(
            F.col("b.cell").alias("cell"),
            F.col("b.vec_id").alias("vec_id"),
        )
    )
    zero = F.lit(0).cast("long")
    members = ch.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    stats = dom.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_dom_edges"),
        F.countDistinct("vec_id").cast("long").alias("n_dropped"),
    )
    result = (
        members.join(stats, "cell", "left")
        .select(
            F.col("cell").alias("cluster"),
            "n_members",
            F.coalesce(F.col("n_dom_edges"), zero).alias("n_dom_edges"),
            F.coalesce(F.col("n_dropped"), zero).alias("n_dropped"),
            (F.col("n_members") - F.coalesce(F.col("n_dropped"), zero))
            .alias("n_kept"),
        )
        .orderBy("cluster")
    )
    return materialize_and_release(result, v, ch)


def _patched(mod, fn_name, use_scan_parallel):
    """Build an arm that runs registry query fn_name with the module's
    load_table swapped for scan_parallel (or not)."""
    from workshop3_etl_spark.plans import registry
    from workshop3_etl_spark.sources.tables import load_table, scan_parallel

    fn = registry.queries()[fn_name]

    def arm(spark, sf_dir):
        orig = mod.load_table
        if use_scan_parallel:
            mod.load_table = lambda sp, sf_, name: scan_parallel(sp, sf_, name)
        try:
            return fn(spark, sf_dir)
        finally:
            mod.load_table = orig

    return arm


def main() -> int:
    from workshop3_etl_spark.plans import registry
    from workshop3_etl_spark.session import get_spark

    spark = get_spark(app_name="probe_ab_r11b")
    q = registry.queries()
    names = sys.argv[1:] or ["semdedup", "neardup", "subruns"]
    if "semdedup" in names:
        ab(spark, "sim_semantic_dedup_clusters", old_semdedup,
           q["sim_semantic_dedup_clusters"])
    if "neardup" in names:
        from workshop3_etl_spark.operators import similarity as S

        ab(spark, "sim_neardup_lsh_buckets(scan_parallel)",
           _patched(S, "sim_neardup_lsh_buckets", False),
           _patched(S, "sim_neardup_lsh_buckets", True))
    if "subruns" in names:
        from workshop3_etl_spark.operators import dedup as D

        ab(spark, "dedup_exact_substring_runs(scan_parallel)",
           _patched(D, "dedup_exact_substring_runs", False),
           _patched(D, "dedup_exact_substring_runs", True))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Interleaved A/B for the r11 session-2 batch: OLD plans
reconstructed inline (from git HEAD before the session-2 edits) vs
the NEW registry code, alternated in ONE session so host drift
cancels (the r10/r11 discipline). Numbers land in OPTIMIZATION_r11.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))


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


# ---------------- OLD implementations (pre-session-2 HEAD) ----------


def old_ivfpq(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators.similarity import (
        _IVF_PROBES,
        _N_QUERIES,
        _PQ_RERANK,
        _PQ_SUB,
        _TOP_K,
        _ivf_cells_df,
        _ivfpq_books_df,
        dot_fold,
    )
    from workshop3_etl_spark.functions.cache import materialize_and_release
    from workshop3_etl_spark.sources.tables import scan_parallel

    emb = scan_parallel(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        F.col("embedding").alias("ev"),
        dot_fold("embedding", "embedding").alias("nrm"),
    ).persist()
    cells = F.broadcast(_ivf_cells_df(spark))
    cscored = v.crossJoin(cells).select(
        "vec_id",
        "ev",
        "nrm",
        "cell",
        "centroid",
        (F.col("cc") - 2 * dot_fold("ev", "centroid")).alias("dist2"),
    )
    wv = Window.partitionBy("vec_id").orderBy(F.asc("dist2"), F.asc("cell"))
    assigned = (
        cscored.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "nrm",
            "cell",
            F.expr(
                "zip_with(cast(ev as array<double>), centroid,"
                " (x, y) -> x - y)"
            ).alias("resid"),
        )
        .persist()
    )
    books = F.broadcast(_ivfpq_books_df(spark))
    rdist2 = F.col("bcc") - 2 * F.expr(
        f"aggregate(zip_with(slice(resid, m * {_PQ_SUB} + 1, {_PQ_SUB}),"
        f" bvec, (x, y) -> x * y),"
        f" CAST(0.0 AS DOUBLE), (acc, w) -> acc + w)"
    )
    wc = Window.partitionBy("vec_id", "m").orderBy(
        F.asc("rdist2"), F.asc("code")
    )
    codes = (
        assigned.crossJoin(books)
        .select(
            "vec_id", "nrm", "cell", "m", "code", rdist2.alias("rdist2")
        )
        .withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") == 1)
        .select(
            F.col("vec_id").alias("candidate_id"),
            "cell",
            F.col("nrm").alias("cn"),
            "m",
            "code",
        )
        .persist()
    )
    codes.count()
    assigned.unpersist()

    q = v.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("ev").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    qc = q.crossJoin(cells).select(
        "query_id",
        "cell",
        (F.col("cc") - 2 * dot_fold("qv", "centroid")).alias("dist2"),
        dot_fold("qv", "centroid").alias("base_dot"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("dist2"), F.asc("cell"))
    probes = (
        qc.withColumn("cell_rank", F.row_number().over(wq))
        .filter(F.col("cell_rank") <= _IVF_PROBES)
        .select("query_id", "cell", "base_dot")
    )
    lut = q.crossJoin(books).select(
        "query_id",
        "qn",
        "m",
        "code",
        F.expr(
            f"aggregate(zip_with("
            f" slice(cast(qv as array<double>), m * {_PQ_SUB} + 1, {_PQ_SUB}),"
            f" bvec, (x, y) -> x * y),"
            f" CAST(0.0 AS DOUBLE), (acc, w) -> acc + w)"
        ).alias("pdot"),
    )
    approx = (
        codes.join(F.broadcast(probes), "cell")
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .filter(F.col("query_id") != F.col("candidate_id"))
        .groupBy("query_id", "candidate_id")
        .agg(
            (
                F.first("base_dot")
                + F.aggregate(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("m", "pdot"))
                        ),
                        lambda s: s["pdot"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("adot"),
            F.first("qn").alias("qn"),
            F.first("cn").alias("cn"),
        )
        .select(
            "query_id",
            "candidate_id",
            (F.col("adot") / (F.sqrt("qn") * F.sqrt("cn"))).alias(
                "approx_cos"
            ),
        )
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cos"), F.asc("candidate_id")
    )
    shortlist = (
        approx.withColumn("srank", F.row_number().over(ws))
        .filter(F.col("srank") <= _PQ_RERANK)
        .select("query_id", "candidate_id")
    )
    cvec = v.select(
        F.col("vec_id").alias("candidate_id"),
        F.col("ev").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    sim = (
        shortlist.join(F.broadcast(q), "query_id")
        .join(cvec, "candidate_id")
        .select(
            "query_id",
            "candidate_id",
            (dot_fold("qv", "cv") / (F.sqrt("qn") * F.sqrt("cn")))
            .alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("candidate_id")
    )
    result = (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "rank", "candidate_id", "cosine_sim")
        .orderBy("query_id", "rank")
    )
    return materialize_and_release(result, v, codes)


def main() -> int:
    from workshop3_etl_spark.plans import registry
    from workshop3_etl_spark.session import get_spark

    spark = get_spark(app_name="probe_ab_r11c")
    queries = registry.queries()
    which = set(sys.argv[1:]) or {"ivfpq"}
    if "ivfpq" in which:
        ab(spark, "sim_ann_ivfpq_topk", old_ivfpq,
           queries["sim_ann_ivfpq_topk"])
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())


def _old_seeds(docs):
    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators.dedup import (
        _SUBRUN_SEEDS_SPARK,
        _WINNOW_TOKS_SPARK,
        K_SUBRUN,
    )

    return (
        docs.selectExpr("doc_id", f"{_WINNOW_TOKS_SPARK} as toks")
        .filter(F.expr(f"size(toks) >= {K_SUBRUN}"))
        .selectExpr("doc_id", f"{_SUBRUN_SEEDS_SPARK} as ss")
        .select("doc_id", F.explode("ss").alias("s"))
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
    )


def _with_seeds(fn_name, seeds_fn):
    """Run a registered substring-chain query with substring_run_seeds
    temporarily swapped (old expression form vs new Arrow form)."""

    def run(spark, sf_dir):
        from workshop3_etl_spark.operators import dedup as D
        from workshop3_etl_spark.plans import registry

        orig = D.substring_run_seeds
        D.substring_run_seeds = seeds_fn
        try:
            return registry.queries()[fn_name](spark, sf_dir)
        finally:
            D.substring_run_seeds = orig

    return run


def main2() -> int:
    from workshop3_etl_spark.operators import dedup as D
    from workshop3_etl_spark.session import get_spark

    spark = get_spark(app_name="probe_ab_r11c_seeds")
    new_seeds = D.substring_run_seeds
    for q in ("dedup_exact_substring_runs", "corpus_remove_substring_runs"):
        ab(
            spark,
            q,
            _with_seeds(q, _old_seeds),
            _with_seeds(q, new_seeds),
        )
    spark.stop()
    return 0

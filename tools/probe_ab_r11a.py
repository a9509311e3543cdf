#!/usr/bin/env python
"""Interleaved A/B for the first r11 batch: OLD plans reconstructed
inline (from git HEAD before the r11 edits) vs the NEW registry code,
alternated in ONE session so host drift cancels (r10 discipline).
Not committed evidence by itself — numbers land in OPTIMIZATION_r11.md.
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
    # one untimed warmup each
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


# ---------------- OLD implementations (pre-r11, from git HEAD) ------


def old_bm25(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators.text import (
        _BM25_TOPK,
        _bm25_frames,
        _bm25_qterms,
        _bm25_score,
    )

    fr = _bm25_frames(spark, sf_dir)
    qterms = _bm25_qterms(fr["termdf"])
    scored = _bm25_score(fr["pos"], fr["dl"], fr["stats"], qterms)
    top = scored.orderBy(F.desc("score_x1000"), "doc_id").limit(_BM25_TOPK)
    wr = Window.orderBy(F.desc("score_x1000"), "doc_id")
    return (
        top.withColumn("rank", F.row_number().over(wr).cast("int"))
        .select("rank", "doc_id", "n_terms_matched", "score_x1000")
        .orderBy("rank")
    )


def old_prf(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from workshop3_etl_spark.functions.cache import materialize_and_release
    from workshop3_etl_spark.operators.text import (
        _BM25_TOPK,
        _PRF_EXP_TERMS,
        _PRF_FB_DOCS,
        _bm25_frames,
        _bm25_qterms,
        _bm25_score,
    )

    fr = _bm25_frames(spark, sf_dir)
    pos = fr["pos"].persist()
    dl = fr["dl"].persist()
    s1 = None
    try:
        stats = fr["stats"]
        q1 = _bm25_qterms(fr["termdf"])
        s1 = _bm25_score(pos, dl, stats, q1).persist()
        fb = s1.orderBy(F.desc("score_x1000"), "doc_id").limit(
            _PRF_FB_DOCS
        ).select("doc_id")
        wr = Window.orderBy(F.desc("score_x1000"), "doc_id")
        r1rank = (
            s1.orderBy(F.desc("score_x1000"), "doc_id")
            .limit(_BM25_TOPK)
            .withColumn("r1_rank", F.row_number().over(wr).cast("int"))
            .select("doc_id", "r1_rank")
        )
        cand = (
            pos.join(F.broadcast(fb), "doc_id")
            .join(
                F.broadcast(q1.select(F.col("term").alias("w"))),
                "w",
                "left_anti",
            )
            .groupBy(F.col("w").alias("term"))
            .agg(F.count(F.lit(1)).cast("long").alias("fb_tf"))
        )
        expn = (
            cand.join(fr["termdf"], "term")
            .crossJoin(F.broadcast(stats))
            .withColumn(
                "fb_score",
                F.expr("fb_tf * ((1000L * (n + 1)) div (df + 1))"),
            )
            .orderBy(F.desc("fb_score"), "term")
            .limit(_PRF_EXP_TERMS)
            .select("term", "df")
        )
        q2 = q1.unionByName(expn)
        s2 = _bm25_score(pos, dl, stats, q2)
        top = s2.orderBy(F.desc("score_x1000"), "doc_id").limit(_BM25_TOPK)
        out = (
            top.withColumn("rank", F.row_number().over(wr).cast("int"))
            .join(F.broadcast(r1rank), "doc_id", "left")
            .select(
                "rank", "doc_id", "n_terms_matched", "score_x1000",
                "r1_rank",
            )
            .orderBy("rank")
        )
        out = materialize_and_release(out, pos, dl, s1)
    except Exception:
        pos.unpersist()
        dl.unpersist()
        if s1 is not None:
            s1.unpersist()
        raise
    return out


def old_e2e(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators.corpus import (
        _CHUNK_SIZE,
        _E2E_GRAMS_SPARK,
        _STRIDE,
        _mix_keep_col,
    )
    from workshop3_etl_spark.operators.text import _TOKENS
    from workshop3_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        F.md5(
            F.expr("cast(trim(regexp_replace(lower(text), '\\\\s+', ' ')) as binary)")
        ).alias("fp"),
        F.expr(_TOKENS).alias("t"),
    )
    tok_share = (
        base.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            (F.max("c").cast("double") / F.sum("c").cast("double"))
            .alias("max_token_ratio")
        )
    )
    dup_ratio = (
        F.expr(
            f"cast(size({_E2E_GRAMS_SPARK}) -"
            f" size(array_distinct({_E2E_GRAMS_SPARK})) as double)"
        )
        / F.expr(f"cast(nullif(size({_E2E_GRAMS_SPARK}), 0) as double)")
    )
    scalars = base.select(
        "doc_id",
        "lang",
        "fp",
        F.expr("cast(size(t) as bigint)").alias("n_tokens"),
        dup_ratio.alias("dup_2gram_ratio"),
        _mix_keep_col().alias("in_sample"),
        F.expr(
            f"case when size(t) = 0 then 0"
            f" else 1 + cast(greatest(0, ceil((size(t) - {_CHUNK_SIZE})"
            f" / cast({_STRIDE} as double))) as bigint) end"
        ).alias("n_chunks"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    flagged = (
        scalars.join(tok_share, "doc_id", "left")
        .withColumn("is_unique", (F.row_number().over(w) == 1).cast("int"))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "is_unique",
            F.when(
                (F.col("n_tokens") >= 5)
                & ~(
                    F.coalesce(F.col("dup_2gram_ratio") > 0.2, F.lit(False))
                    | F.coalesce(F.col("max_token_ratio") > 0.2, F.lit(False))
                ),
                1,
            )
            .otherwise(0)
            .alias("is_quality"),
            "in_sample",
            "n_chunks",
        )
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum("is_unique").cast("long").alias("n_unique"),
        F.sum(F.col("is_unique") * F.col("is_quality")).cast("long")
        .alias("n_quality"),
        F.sum(F.col("is_unique") * F.col("is_quality") * F.col("in_sample"))
        .cast("long")
        .alias("n_sampled"),
        F.sum(
            F.col("is_unique") * F.col("is_quality") * F.col("in_sample")
            * F.col("n_tokens")
        )
        .cast("long")
        .alias("total_tokens_sampled"),
        F.sum(
            F.col("is_unique") * F.col("is_quality") * F.col("in_sample")
            * F.col("n_chunks")
        )
        .cast("long")
        .alias("n_chunks_sampled"),
    )


def old_happiness(spark, sf_dir):
    import os as _os
    from functools import reduce

    from pyspark.sql import functions as F

    from workshop3_etl_spark.schema import (
        CANONICAL_COLS,
        MODEL_COLS,
        TARGET,
        YEAR_ALIASES,
    )
    from workshop3_etl_spark.sources.happiness import _FIXTURES, clean

    def read_year_old(path, year):
        raw = spark.read.csv(path, header=True, inferSchema=False)
        aliases = YEAR_ALIASES[year]
        select_list = [
            F.col(f"`{src}`").alias(dst)
            for src, dst in aliases.items()
            if src in raw.columns
        ]
        df = raw.select(*select_list)
        if "Year" not in df.columns:
            df = df.withColumn("Year", F.lit(year))
        casts = [F.col("Country").cast("string").alias("Country"),
                 F.col("Year").try_cast("int").alias("Year")]
        for c in MODEL_COLS:
            casts.append(
                (F.col(c).try_cast("double") if c in df.columns
                 else F.lit(None).cast("double")).alias(c)
            )
        return df.select(*casts).select(*CANONICAL_COLS)

    paths = {y: _os.path.join(_FIXTURES, f"{y}.csv") for y in YEAR_ALIASES}
    frames = [read_year_old(p, y) for y, p in sorted(paths.items())]
    df = clean(reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    ))
    score_sum = F.sum(F.col(TARGET).cast("decimal(27,6)")).cast("double")
    return (
        df.groupBy("Year")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("Country").alias("n_countries"),
            score_sum.alias("sum_score"),
            (score_sum / F.count(F.lit(1)).cast("double")).alias("mean_score"),
            F.sum(F.col("GDP per capita").cast("decimal(27,6)")).cast("double")
            .alias("sum_gdp"),
        )
        .orderBy("Year")
    )


def main() -> int:
    from workshop3_etl_spark.plans import registry
    from workshop3_etl_spark.session import get_spark

    spark = get_spark(app_name="probe_ab_r11a")
    q = registry.queries()
    names = sys.argv[1:] or ["bm25", "prf", "e2e", "happiness"]
    if "bm25" in names:
        ab(spark, "search_bm25_topk", old_bm25, q["search_bm25_topk"])
    if "prf" in names:
        ab(spark, "search_prf_expanded_topk", old_prf,
           q["search_prf_expanded_topk"])
    if "e2e" in names:
        ab(spark, "corpus_e2e_training_prep", old_e2e,
           q["corpus_e2e_training_prep"])
    if "happiness" in names:
        ab(spark, "happiness_unified_profile", old_happiness,
           q["happiness_unified_profile"])
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

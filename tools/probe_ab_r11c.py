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


def old_neardup(spark, sf_dir):
    """Pre-session-2 sim_neardup_lsh_buckets: interpreted fold
    signature pass (HOF buckets expression + posexplode)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from workshop3_etl_spark.functions.cache import materialize_and_release
    from workshop3_etl_spark.operators.similarity import (
        _log_bucket_skew,
        _NEARDUP_T,
        _RAD_BITS,
        _RAD_BUCKET_CAP,
        _RAD_SUB_BITS,
        _RAD_TABLES,
        _rad_dot_spark,
        _rad_plane,
        dot_fold,
    )
    from workshop3_etl_spark.sources.tables import scan_parallel

    cap = _RAD_BUCKET_CAP
    emb = scan_parallel(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        "label",
        F.col("embedding").alias("ev"),
        dot_fold("embedding", "embedding").alias("nrm"),
    )

    def _bits(t, h0, h1):
        return F.concat(
            *[
                F.when(
                    F.expr(_rad_dot_spark("ev", _rad_plane(t, h))) >= 0,
                    "1",
                ).otherwise("0")
                for h in range(h0, h1)
            ]
        )

    buckets = F.array(
        *[
            F.struct(
                _bits(t, 0, _RAD_BITS).alias("b"),
                _bits(t, _RAD_BITS, _RAD_BITS + _RAD_SUB_BITS).alias("s"),
                F.expr(
                    _rad_dot_spark(
                        "ev", _rad_plane(t, _RAD_BITS + _RAD_SUB_BITS)
                    )
                ).alias("proj"),
            )
            for t in range(_RAD_TABLES)
        ]
    )
    sig_raw = v.select(
        "vec_id", F.posexplode(buckets).alias("table_id", "bs")
    ).persist()
    sizes = (
        sig_raw.groupBy(
            "table_id",
            F.col("bs.b").alias("sb"),
            F.col("bs.s").alias("ss"),
        )
        .agg(F.count(F.lit(1)).alias("n_bs"))
        .withColumn(
            "n_b",
            F.sum("n_bs").over(Window.partitionBy("table_id", "sb")),
        )
        .select(
            F.col("table_id").alias("st"),
            "sb",
            "ss",
            (F.col("n_b") > cap).alias("split"),
            ((F.col("n_b") > cap) & (F.col("n_bs") > cap)).alias("windowed"),
        )
    )
    keyed = (
        sig_raw.join(
            F.broadcast(sizes),
            (F.col("table_id") == F.col("st"))
            & (F.col("bs.b") == F.col("sb"))
            & (F.col("bs.s") == F.col("ss")),
        )
        .select(
            "vec_id",
            "table_id",
            F.col("bs.proj").alias("proj"),
            F.when(F.col("split"), F.concat(F.col("bs.b"), F.col("bs.s")))
            .otherwise(F.col("bs.b"))
            .alias("bucket"),
            "windowed",
        )
    )
    half = F.greatest(F.lit(1), F.lit(cap // 2))
    wrk = Window.partitionBy("table_id", "bucket").orderBy(
        F.col("proj").asc(), F.col("vec_id").asc()
    )
    ranked = keyed.withColumn(
        "w0", F.floor((F.row_number().over(wrk) - 1) / half).cast("long")
    )
    sig = (
        ranked.select(
            "vec_id",
            "table_id",
            F.explode(
                F.when(
                    F.col("windowed"),
                    F.array(
                        F.concat(
                            F.col("bucket"), F.lit("#"),
                            F.col("w0").cast("string"),
                        ),
                        F.concat(
                            F.col("bucket"), F.lit("#"),
                            (F.col("w0") + 1).cast("string"),
                        ),
                    ),
                ).otherwise(F.array(F.col("bucket")))
            ).alias("bucket"),
        )
    ).persist()
    sig.count()
    sig_raw.unpersist()
    _log_bucket_skew(sig, cap)
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"))
        .distinct()
    )
    x, y = v.alias("x"), v.alias("y")
    cos = (
        F.expr(
            "aggregate(zip_with(x.ev, y.ev,"
            " (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (acc, w) -> acc + w)"
        )
        / (F.sqrt(F.col("x.nrm")) * F.sqrt(F.col("y.nrm")))
    )
    result = (
        cand.join(x, F.col("va") == F.col("x.vec_id"))
        .join(y, F.col("vb") == F.col("y.vec_id"))
        .select(
            F.col("va").alias("vec_id_a"),
            F.col("vb").alias("vec_id_b"),
            (F.col("x.label") == F.col("y.label")).alias("same_label"),
            cos.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= _NEARDUP_T)
        .orderBy("vec_id_a", "vec_id_b")
    )
    return materialize_and_release(result, sig)


def main3() -> int:
    from workshop3_etl_spark.plans import registry
    from workshop3_etl_spark.session import get_spark

    spark = get_spark(app_name="probe_ab_r11c_neardup")
    ab(spark, "sim_neardup_lsh_buckets", old_neardup,
       registry.queries()["sim_neardup_lsh_buckets"])
    spark.stop()
    return 0


def old_corr_pairs(spark, sf_dir):
    """Pre-session-2 embedding_corr_pairs: interpreted in-map 2080
    product expansion + explode + groupBy."""
    from pyspark.sql import functions as F

    from workshop3_etl_spark.functions.cache import materialize_and_release
    from workshop3_etl_spark.operators.similarity import (
        _CORR_SCALE,
        _CORR_TOPK,
    )
    from workshop3_etl_spark.sources.tables import scan_parallel

    emb = scan_parallel(spark, sf_dir, "embeddings")
    q = emb.select(
        F.expr(
            "transform(embedding, x -> cast(floor(cast(x as double)"
            f" * {_CORR_SCALE}) as bigint))"
        ).alias("ql")
    ).persist()
    pairs = q.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, 64), i ->"
                " transform(sequence(i, 64), j -> struct("
                " i as i, j as j,"
                " element_at(ql, i) * element_at(ql, j) as p))))"
            )
        ).alias("e")
    ).select("e.i", "e.j", F.col("e.p").cast("decimal(38,0)").alias("p"))
    p = pairs.groupBy("i", "j").agg(F.sum("p").alias("p"))
    s = (
        q.select(F.posexplode("ql").alias("pos", "qv"))
        .select((F.col("pos") + 1).alias("dim"), "qv")
        .groupBy("dim")
        .agg(F.sum("qv").cast("decimal(38,0)").alias("s"))
    )
    g = q.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n"))
    m = (
        p.crossJoin(F.broadcast(g))
        .join(F.broadcast(s.select(F.col("dim").alias("i"), F.col("s").alias("si"))), "i")
        .join(F.broadcast(s.select(F.col("dim").alias("j"), F.col("s").alias("sj"))), "j")
        .select(
            "i", "j",
            (F.col("n") * F.col("p") - F.col("si") * F.col("sj")).alias("m"),
        )
    )
    diag = m.where(F.col("i") == F.col("j")).select(
        F.col("i").alias("dim"), F.col("m").alias("v")
    )
    out = (
        m.where(F.col("i") < F.col("j"))
        .join(F.broadcast(diag.select(F.col("dim").alias("i"), F.col("v").alias("vi"))), "i")
        .join(F.broadcast(diag.select(F.col("dim").alias("j"), F.col("v").alias("vj"))), "j")
        .select(
            F.col("i").cast("long").alias("dim_i"),
            F.col("j").cast("long").alias("dim_j"),
            (
                F.col("m").cast("double")
                / (F.sqrt(F.col("vi").cast("double"))
                   * F.sqrt(F.col("vj").cast("double")))
            ).alias("corr"),
        )
        .orderBy(F.abs(F.col("corr")).desc(), "dim_i", "dim_j")
        .limit(_CORR_TOPK)
    )
    return materialize_and_release(out, q)


def main4() -> int:
    from workshop3_etl_spark.plans import registry
    from workshop3_etl_spark.session import get_spark

    spark = get_spark(app_name="probe_ab_r11c_corr")
    ab(spark, "embedding_corr_pairs", old_corr_pairs,
       registry.queries()["embedding_corr_pairs"])
    spark.stop()
    return 0


def old_novelty(spark, sf_dir):
    """Pre-session-2 corpus_ngram_novelty_curve: two interpreted
    3-gram md5 HOF passes (explode leg + size leg)."""
    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators.corpus import (
        _NOVELTY_GRAMS,
        _NOVELTY_SHARDS,
        assemble_novelty_curve,
    )
    from workshop3_etl_spark.sources.tables import scan_parallel

    docs = scan_parallel(spark, sf_dir, "documents")
    grams = docs.select(
        (F.col("doc_id") % _NOVELTY_SHARDS).alias("shard"),
        F.explode(F.expr(_NOVELTY_GRAMS)).alias("g"),
    )
    firsts = grams.groupBy("g").agg(
        F.min("shard").cast("long").alias("first_shard")
    )
    novel = firsts.groupBy(F.col("first_shard").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new_gram_types")
    )
    per_shard = (
        docs.select(
            (F.col("doc_id") % _NOVELTY_SHARDS).alias("shard"),
            F.expr(f"size({_NOVELTY_GRAMS})").alias("n_inst"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_inst").cast("long").alias("n_gram_instances"),
        )
    )
    return assemble_novelty_curve(per_shard, novel)


def main5() -> int:
    from workshop3_etl_spark.plans import registry
    from workshop3_etl_spark.session import get_spark

    spark = get_spark(app_name="probe_ab_r11c_novelty")
    ab(spark, "corpus_ngram_novelty_curve", old_novelty,
       registry.queries()["corpus_ngram_novelty_curve"])
    spark.stop()
    return 0


def old_semdedup(spark, sf_dir):
    """Pre-session-2 sim_semantic_dedup_clusters: (cell, chunk)
    self-equi-join with interpreted per-pair cosine folds."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from workshop3_etl_spark.functions.cache import materialize_and_release
    from workshop3_etl_spark.operators.similarity import (
        _SEM_CAP,
        _SEM_TAU,
        _artifact_rows_cells,
        dot_fold,
    )
    from workshop3_etl_spark.sources.tables import scan_parallel

    emb = scan_parallel(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        F.col("embedding").alias("ev"),
        dot_fold("embedding", "embedding").alias("nrm"),
    )
    adist_structs = ", ".join(
        "named_struct('adist', "
        + repr(cc)
        + "D - 2 * aggregate(zip_with(ev, array("
        + ", ".join(repr(x) + "D" for x in centroid)
        + "), (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        + " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v),"
        + f" 'cell', {int(cell)})"
        for cell, centroid, cc in _artifact_rows_cells()
    )
    m = v.selectExpr(
        "vec_id", "ev", "nrm",
        f"array_min(array({adist_structs})) as mc",
    ).select(
        "vec_id", "ev", "nrm",
        F.col("mc.cell").alias("cell"),
        (F.col("nrm") + F.col("mc.adist")).alias("pd2"),
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
    return materialize_and_release(result, ch)


def main6() -> int:
    from workshop3_etl_spark.plans import registry
    from workshop3_etl_spark.session import get_spark

    spark = get_spark(app_name="probe_ab_r11c_semdedup")
    ab(spark, "sim_semantic_dedup_clusters", old_semdedup,
       registry.queries()["sim_semantic_dedup_clusters"])
    spark.stop()
    return 0


def old_phrase(spark, sf_dir):
    """Pre-session-2 search_phrase_match_topk: bigram census via a
    per-document lead() window over the posting frame."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from workshop3_etl_spark.functions.cache import materialize_and_release
    from workshop3_etl_spark.operators.text import (
        _PHRASE_N,
        _PHRASE_TOPK,
        _TOKENS,
    )
    from workshop3_etl_spark.sources.tables import load_table

    tk = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TOKENS).alias("toks")
    )
    pos = tk.select(
        "doc_id", F.posexplode("toks").alias("p", "w")
    ).persist()
    wb = Window.partitionBy("doc_id").orderBy("p")
    bi = pos.select(
        F.col("w").alias("w1"), F.lead("w").over(wb).alias("w2")
    ).filter(F.col("w2").isNotNull())
    bc = bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_total")
    )
    head = bc.orderBy(F.desc("n_total"), "w1", "w2").limit(_PHRASE_N)
    wp = Window.orderBy(F.desc("n_total"), "w1", "w2")
    phrases = head.select(
        F.row_number().over(wp).cast("int").alias("phrase_id"),
        "w1", "w2", "n_total",
    )
    p1 = pos.join(
        F.broadcast(phrases.select("phrase_id", F.col("w1").alias("w"))),
        "w",
    ).select("phrase_id", "doc_id", "p")
    p2 = pos.join(
        F.broadcast(phrases.select("phrase_id", F.col("w2").alias("w"))),
        "w",
    ).select("phrase_id", "doc_id", (F.col("p") - 1).alias("p"))
    occ = (
        p1.join(p2, ["phrase_id", "doc_id", "p"])
        .groupBy("phrase_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
    )
    wr = Window.partitionBy("phrase_id").orderBy(F.desc("n_occ"), "doc_id")
    out = (
        occ.withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= _PHRASE_TOPK)
        .join(F.broadcast(phrases), "phrase_id")
        .select(
            "phrase_id",
            F.concat_ws(" ", "w1", "w2").alias("phrase"),
            "n_total",
            "rank",
            "doc_id",
            "n_occ",
        )
        .orderBy("phrase_id", "rank")
    )
    return materialize_and_release(out, pos)


def main7() -> int:
    from workshop3_etl_spark.plans import registry
    from workshop3_etl_spark.session import get_spark

    spark = get_spark(app_name="probe_ab_r11c_phrase")
    ab(spark, "search_phrase_match_topk", old_phrase,
       registry.queries()["search_phrase_match_topk"])
    spark.stop()
    return 0


def _old_pairs_expand(q_name):
    """Run a registered assoc/graph query with the pair census
    temporarily swapped back to the HOF expansion."""

    def run(spark, sf_dir):
        from pyspark.sql import functions as F

        from workshop3_etl_spark.operators import assoc as A
        from workshop3_etl_spark.plans import registry

        def hof_partials(baskets):
            return baskets.select(
                F.explode(F.expr(A._PAIR_SQL)).alias("pr")
            ).select(
                F.col("pr.p1").alias("p1"),
                F.col("pr.p2").alias("p2"),
                F.lit(1).cast("long").alias("n"),
            )

        orig = A._basket_pair_partials_arrow
        A._basket_pair_partials_arrow = hof_partials
        try:
            return registry.queries()[q_name](spark, sf_dir)
        finally:
            A._basket_pair_partials_arrow = orig

    return run


def main8() -> int:
    from workshop3_etl_spark.plans import registry
    from workshop3_etl_spark.session import get_spark

    spark = get_spark(app_name="probe_ab_r11c_pairs")
    for q in (
        "basket_part_pairs_lift",
        "graph_triangle_count_copurchase",
        "graph_pagerank_copurchase",
    ):
        ab(spark, q, _old_pairs_expand(q), registry.queries()[q])
    spark.stop()
    return 0

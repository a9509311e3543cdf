"""Focused pins for the round-11 operator-internal rewrites.

Each test checks the rewritten internals against an INDEPENDENT
reference implementation (plain Python, or the pre-rewrite relational
plan rebuilt inline), not against the DuckDB oracle — the oracle
parity suite already covers that end to end. These exist so a later
refactor of the rewritten expression cannot silently change semantics
while staying plausible.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT


def test_e2e_max_token_ratio_fold_matches_counter(spark):
    """corpus_e2e_training_prep (r11) computes max_token_ratio as a
    map-side longest-equal-run fold over sort_array(tokens). Pin it
    against Python's Counter on the real corpus: the fold must equal
    max multiplicity / total tokens for every document (NULL for
    empty token lists, as the old explode->groupBy->left-join path
    produced)."""
    from workshop3_etl_spark.operators.text import _TOKENS
    from workshop3_etl_spark.sources.tables import load_table

    docs = load_table(spark, SF_CORRECT, "documents")
    # the exact expression corpus_e2e_training_prep uses
    max_run = (
        "aggregate(sort_array(t),"
        " named_struct('prev', cast(null as string), 'run', 0L,"
        " 'best', 0L),"
        " (a, x) -> named_struct("
        "   'prev', x,"
        "   'run', if(x <=> a.prev, a.run + 1L, 1L),"
        "   'best', greatest(a.best, if(x <=> a.prev, a.run + 1L, 1L))),"
        " a -> a.best)"
    )
    rows = (
        docs.selectExpr("doc_id", f"{_TOKENS} as t")
        .selectExpr(
            "doc_id",
            "t",
            f"cast({max_run} as double)"
            " / cast(nullif(size(t), 0) as double) as ratio",
        )
        .collect()
    )
    assert rows
    for r in rows:
        toks = list(r["t"])
        if not toks:
            assert r["ratio"] is None
        else:
            expected = max(Counter(toks).values()) / len(toks)
            assert r["ratio"] == expected, r["doc_id"]


def test_semdedup_argmin_matches_window_assignment(spark):
    """sim_semantic_dedup_clusters (r11) assigns cells via a map-side
    lexicographic array_min instead of the crossJoin + row_number
    window. Pin the observable consequence — per-cluster membership —
    against the OLD relational assignment rebuilt inline."""
    from pyspark.sql import Window

    from workshop3_etl_spark.operators.similarity import (
        _ivf_cells_df,
        dot_fold,
        sim_semantic_dedup_clusters,
    )
    from workshop3_etl_spark.sources.tables import load_table

    # old assignment: broadcast crossJoin + per-vector window
    emb = load_table(spark, SF_CORRECT, "embeddings")
    v = emb.select(
        "vec_id",
        F.col("embedding").alias("ev"),
        dot_fold("embedding", "embedding").alias("nrm"),
    )
    scored = v.crossJoin(F.broadcast(_ivf_cells_df(spark))).select(
        "vec_id",
        "cell",
        (F.col("cc") - 2 * dot_fold("ev", "centroid")).alias("adist"),
    )
    wv = Window.partitionBy("vec_id").orderBy(
        F.asc("adist"), F.asc("cell")
    )
    old_members = {
        r["cell"]: r["n"]
        for r in (
            scored.withColumn("rn", F.row_number().over(wv))
            .filter(F.col("rn") == 1)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    new_members = {
        r["cluster"]: r["n_members"]
        for r in sim_semantic_dedup_clusters(spark, SF_CORRECT).collect()
    }
    assert new_members == old_members

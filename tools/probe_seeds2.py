#!/usr/bin/env python
"""Second seed-hash triage: partition counts, explicit widths, and
allocation-free gram-key candidates."""

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


def main() -> int:
    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators.dedup import (
        K_SUBRUN,
        _WINNOW_TOKS_SPARK,
    )
    from workshop3_etl_spark.session import get_spark
    from workshop3_etl_spark.sources.tables import load_table, scan_parallel

    spark = get_spark(app_name="probe_seeds2")
    docs_bare = load_table(spark, SF, "documents")
    docs_par = scan_parallel(spark, SF, "documents")
    print(
        "partitions bare=%d par=%d defaultParallelism=%d"
        % (
            docs_bare.rdd.getNumPartitions(),
            docs_par.rdd.getNumPartitions(),
            spark.sparkContext.defaultParallelism,
        ),
        flush=True,
    )

    def seeds(docs, hexpr):
        return (
            docs.selectExpr("doc_id", f"{_WINNOW_TOKS_SPARK} as toks")
            .filter(F.expr(f"size(toks) >= {K_SUBRUN}"))
            .selectExpr(
                "doc_id",
                f"transform(sequence(1, size(toks) - {K_SUBRUN - 1}),"
                f" i -> struct(i as pos, {hexpr} as h)) as ss",
            )
            .select("doc_id", F.explode("ss").alias("s"))
            .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
        )

    md5_h = f"md5(concat_ws(' ', slice(toks, i, {K_SUBRUN})))"
    slice_only = f"slice(toks, i, {K_SUBRUN})"
    concat_only = f"concat_ws(' ', slice(toks, i, {K_SUBRUN}))"
    xx8 = "xxhash64(" + ", ".join(
        f"element_at(ht, i + {j})" for j in range(K_SUBRUN)
    ) + ")"

    def seeds_ht(docs, hexpr):
        # token-level hash array once per doc, then per-position combine
        return (
            docs.selectExpr("doc_id", f"{_WINNOW_TOKS_SPARK} as toks")
            .filter(F.expr(f"size(toks) >= {K_SUBRUN}"))
            .selectExpr(
                "doc_id",
                "transform(toks, t -> xxhash64(t)) as ht",
                "size(toks) as nt",
            )
            .selectExpr(
                "doc_id",
                f"transform(sequence(1, nt - {K_SUBRUN - 1}),"
                f" i -> struct(i as pos, {hexpr} as h)) as ss",
            )
            .select("doc_id", F.explode("ss").alias("s"))
            .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
        )

    for tag, docs in (("bare", docs_bare), ("par", docs_par)):
        _t(spark, f"md5-str ({tag})", seeds(docs, md5_h))
        _t(spark, f"slice-only ({tag})", seeds(docs, slice_only))
        _t(spark, f"concat-only ({tag})", seeds(docs, concat_only))
        _t(spark, f"xx8-elem ({tag})", seeds_ht(docs, xx8))
    # explicit width sweep on md5 to see scaling
    for w in (4, 16, 64):
        _t(
            spark,
            f"md5-str repartition({w})",
            seeds(docs_bare.repartition(w), md5_h),
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Third triage: does the seeds-map cost scale with data or is it a
fixed floor? 10x the corpus via unionAll and compare."""

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
    import functools

    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators.dedup import (
        K_SUBRUN,
        _WINNOW_TOKS_SPARK,
    )
    from workshop3_etl_spark.session import get_spark
    from workshop3_etl_spark.sources.tables import load_table

    spark = get_spark(app_name="probe_seeds3")
    base = load_table(spark, SF, "documents")
    big = functools.reduce(
        lambda a, b: a.unionAll(b), [base] * 10
    ).repartition(32).persist()
    print("big rows:", big.count(), flush=True)

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
    small = base.repartition(32).persist()
    small.count()
    _t(spark, "md5 1x (32 parts, cached)", seeds(small, md5_h))
    _t(spark, "md5 10x (32 parts, cached)", seeds(big, md5_h))
    _t(spark, "floor 1x", seeds(small, "i"))
    _t(spark, "floor 10x", seeds(big, "i"))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Triage probe: alternative seed-hash expressions for the
substring-runs chain (guide §1 isolate + §4.2 per-task work). Keep or
revert still decided by interleaved A/B on the full operators."""

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

    spark = get_spark(app_name="probe_seeds")
    docs_bare = load_table(spark, SF, "documents")
    docs_par = scan_parallel(spark, SF, "documents")

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
    xx_arr_h = f"xxhash64(slice(toks, i, {K_SUBRUN}))"
    xx_str_h = f"xxhash64(concat_ws(' ', slice(toks, i, {K_SUBRUN})))"

    print("tokens per doc:", flush=True)
    docs_bare.selectExpr(f"size({_WINNOW_TOKS_SPARK}) as n").agg(
        F.count("*"), F.sum("n"), F.max("n")
    ).show()

    for tag, docs in (("bare", docs_bare), ("par", docs_par)):
        _t(spark, f"seeds md5-str ({tag})", seeds(docs, md5_h))
        _t(spark, f"seeds xxhash-arr ({tag})", seeds(docs, xx_arr_h))
        _t(spark, f"seeds xxhash-str ({tag})", seeds(docs, xx_str_h))
        # tokenize-only floor: same frame minus the hash
        _t(
            spark,
            f"seeds no-hash floor ({tag})",
            seeds(docs, "i"),
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

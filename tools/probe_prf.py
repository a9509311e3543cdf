#!/usr/bin/env python
"""Where does search_prf_expanded_topk spend its time? Time each
sub-frame with the noop sink in one session (triage only)."""

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

    from workshop3_etl_spark.operators.text import (
        _bm25_frames,
        _bm25_qterms,
        _bm25_score,
    )
    from workshop3_etl_spark.plans import registry
    from workshop3_etl_spark.session import get_spark

    spark = get_spark(app_name="probe_prf")
    q = registry.queries()
    fr = _bm25_frames(spark, SF)
    _t(spark, "pos (tokenize+explode)", fr["pos"])
    _t(spark, "termdf (vocab agg)", fr["termdf"])
    _t(spark, "dl", fr["dl"])
    q1 = _bm25_qterms(fr["termdf"])
    _t(spark, "q1 (head window)", q1)
    s1 = _bm25_score(fr["pos"], fr["dl"], fr["stats"], q1)
    _t(spark, "s1 (round-1 scored)", s1)
    t0 = time.perf_counter()
    n = s1.count()
    print(f"  s1 rows: {n} ({time.perf_counter() - t0:.3f})", flush=True)
    for name in ("search_bm25_topk", "search_prf_expanded_topk"):
        fn = q[name]
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print(f"  FULL {name}: " + " ".join(f"{r:.3f}" for r in runs), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Round-5 experiment (VERDICT r4 task #4): can multi-probe LSH
(probing adjacent primary-band buckets, one bit flip) recover the
above-threshold pairs the tier-2 projection windows drop, within the
same hard O(cap) bound?

`main` decomposes the recall loss: for every true pair (brute-force
cosine >= threshold) the current pipeline misses, classify it as

- BUCKET-MISS: the pair never shares a (table, keyed bucket) at any
  tier — multi-probe on the primary band COULD recover it if the
  pair's primary signatures are Hamming-1 in some table;
- WINDOW-MISS: the pair shares a windowed (tier-2) bucket but landed
  more than one overlapping window apart — primary-band multi-probe
  CANNOT help (same bucket already), only a wider window stride or a
  better sort projection could.

`--rankdist` then measures how many stride units apart the
window-missed pairs sit (the ceiling for any window-geometry change
under the hard <=cap bound).

Measured result (sf0.1, recorded in NOTES): 52/80 lost pairs are
window-misses; only 4 bucket-misses are Hamming-1 anywhere; multi-probe
rejected.

Usage: python tools/exp_neardup_multiprobe.py [--sf DIR] [--rankdist]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sf_dir() -> str:
    if "--sf" in sys.argv:
        return sys.argv[sys.argv.index("--sf") + 1]
    return "/root/testdata/sf0.1"


def _truth_and_plan(spark, sf_dir):
    """Shared ground-truth + pipeline run: returns (vector frame,
    true pair set, candidate pair set, keyed signature frame). The
    ONE definition of 'truth' both probes use."""
    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators.similarity import (
        _NEARDUP_T,
        _neardup_lsh_plan,
        dot_fold,
    )
    from workshop3_etl_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        F.col("embedding").alias("ev"),
        dot_fold("embedding", "embedding").alias("nrm"),
    ).persist()
    v.count()
    x, y = v.alias("x"), v.alias("y")
    cos = F.expr(
        "aggregate(zip_with(x.ev, y.ev,"
        " (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, w) -> acc + w)"
    ) / (F.sqrt(F.col("x.nrm")) * F.sqrt(F.col("y.nrm")))
    truth = {
        (r["a"], r["b"])
        for r in x.join(y, F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("a"),
            F.col("y.vec_id").alias("b"),
            cos.alias("c"),
        )
        .filter(F.col("c") >= _NEARDUP_T)
        .collect()
    }
    result, sig = _neardup_lsh_plan(spark, sf_dir)
    got = {(r["vec_id_a"], r["vec_id_b"]) for r in result.collect()}
    return v, truth, got, sig


def main() -> None:
    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators.similarity import (
        _RAD_BITS,
        _RAD_TABLES,
        _rad_dot_spark,
        _rad_plane,
    )
    from workshop3_etl_spark.session import get_spark

    spark = get_spark(app_name="exp-multiprobe")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = _sf_dir()

    t0 = time.perf_counter()
    v, truth, got, sig = _truth_and_plan(spark, sf_dir)
    lost = truth - got
    print(
        f"true_pairs={len(truth)} recall={len(got & truth)}/{len(truth)}"
        f" lost={len(lost)} ({time.perf_counter() - t0:.1f}s)"
    )

    # keyed bucket membership (post-tier keying, incl. '#w' windows)
    mem = sig.select("vec_id", "table_id", "bucket").collect()
    sig.unpersist()
    by_vec: dict[int, set[tuple[int, str]]] = {}
    for r in mem:
        by_vec.setdefault(r["vec_id"], set()).add(
            (r["table_id"], r["bucket"])
        )
    # primary-band signatures per vector per table (recompute exactly)
    prim = v.select(
        "vec_id",
        *[
            F.concat(
                *[
                    F.when(
                        F.expr(_rad_dot_spark("ev", _rad_plane(t, h))) >= 0,
                        "1",
                    ).otherwise("0")
                    for h in range(_RAD_BITS)
                ]
            ).alias(f"t{t}")
            for t in range(_RAD_TABLES)
        ],
    ).collect()
    v.unpersist()
    psig = {r["vec_id"]: [r[f"t{t}"] for t in range(_RAD_TABLES)] for r in prim}

    bucket_miss, window_miss, ham1 = [], [], 0
    for a, b in sorted(lost):
        ka, kb = by_vec.get(a, set()), by_vec.get(b, set())
        # same keyed bucket at any tier would have made them a
        # candidate — so a lost pair sharing the PRE-window bucket
        # (strip '#w') is a window-miss
        pa = {(t, bk.split("#", 1)[0]) for t, bk in ka}
        pb = {(t, bk.split("#", 1)[0]) for t, bk in kb}
        if pa & pb:
            window_miss.append((a, b))
        else:
            bucket_miss.append((a, b))
            if any(
                sum(x != y for x, y in zip(psig[a][t], psig[b][t])) == 1
                for t in range(_RAD_TABLES)
            ):
                ham1 += 1
    print(
        f"lost={len(lost)}: window-miss={len(window_miss)} "
        f"(same tiered bucket, >1 window apart; multi-probe can't help) "
        f"bucket-miss={len(bucket_miss)} (of which Hamming-1 in >=1 "
        f"table: {ham1} = multi-probe recovery ceiling)"
    )
    print(
        f"probe-side cost multiplier if adopted: x{1 + _RAD_BITS} "
        f"join-left rows (index side unchanged)"
    )
    spark.stop()


def rank_distance_probe() -> None:
    """For the window-missed pairs: how many stride units apart do
    they sit in their best shared bucket? If most are within 2
    strides, a third overlapping window leg (L=3, stride cap/3 —
    same <=cap members per window key, 1.5x join legs) recovers them;
    if they are spread, only a cap raise would."""
    from collections import Counter

    from workshop3_etl_spark.operators.similarity import _RAD_BUCKET_CAP
    from workshop3_etl_spark.session import get_spark

    spark = get_spark(app_name="exp-rankdist")
    spark.sparkContext.setLogLevel("ERROR")
    v, truth, got, sig = _truth_and_plan(spark, _sf_dir())
    lost = truth - got
    # window membership with ranks: strip '#w' and recover w0 per row
    mem = sig.select("vec_id", "table_id", "bucket").collect()
    ranks: dict[tuple[int, str], dict[int, int]] = {}
    for r in mem:
        if "#" not in r["bucket"]:
            continue
        base, w = r["bucket"].rsplit("#", 1)
        d = ranks.setdefault((r["table_id"], base), {})
        # each row appears as w0 and w0+1; keep the MIN = w0
        d[r["vec_id"]] = min(d.get(r["vec_id"], 1 << 30), int(w))
    dist: Counter = Counter()
    for a, b in lost:
        best = None
        for d in ranks.values():
            if a in d and b in d:
                dd = abs(d[a] - d[b])
                best = dd if best is None else min(best, dd)
        if best is not None:
            dist[best] += 1
    print(
        f"window-missed pairs by min window-index distance "
        f"(stride={_RAD_BUCKET_CAP // 2}): {dict(sorted(dist.items()))}"
    )
    spark.stop()


if __name__ == "__main__":
    if "--rankdist" in sys.argv:
        rank_distance_probe()
    else:
        main()

#!/usr/bin/env python
"""Round-5 experiment (VERDICT r4 task #4): can multi-probe LSH
(probing adjacent primary-band buckets, one bit flip) recover the
above-threshold pairs the tier-2 projection windows drop, within the
same hard O(cap) bound?

Step 1 decomposes the recall loss: for every true pair (brute-force
cosine >= threshold) that the current pipeline misses, classify it as

- BUCKET-MISS: the pair never shares a (table, keyed bucket) at any
  tier — multi-probe on the primary band COULD recover it if the
  pair's primary signatures are Hamming-1 in some table;
- WINDOW-MISS: the pair shares a windowed (tier-2) bucket but landed
  more than one overlapping window apart — primary-band multi-probe
  CANNOT help (same bucket already), only a wider window stride or a
  better sort projection could.

Step 2 computes, for the bucket-miss pairs, how many are Hamming-1 on
the primary band in at least one table (the multi-probe recovery
ceiling) and the probe-side cost multiplier.

Usage: python tools/exp_neardup_multiprobe.py [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]

    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators.similarity import (
        _NEARDUP_T,
        _RAD_BITS,
        _RAD_TABLES,
        _neardup_lsh_plan,
        _rad_plane,
        _rad_dot_spark,
        dot_fold,
    )
    from workshop3_etl_spark.session import get_spark
    from workshop3_etl_spark.sources.tables import load_table

    spark = get_spark(app_name="exp-multiprobe")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    v = emb.select(
        "vec_id",
        F.col("embedding").alias("ev"),
        dot_fold("embedding", "embedding").alias("nrm"),
    ).persist()
    v.count()

    # ---- ground truth: brute-force all-pairs cosine >= threshold
    t0 = time.perf_counter()
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
    print(
        f"n_vectors={n} true_pairs={len(truth)} "
        f"(brute force {time.perf_counter() - t0:.1f}s)"
    )

    # ---- current pipeline candidates (pre-rerank) + keyed index
    result, sig = _neardup_lsh_plan(spark, sf_dir)
    got = {
        (r["vec_id_a"], r["vec_id_b"]) for r in result.collect()
    }
    lost = truth - got
    print(f"current recall: {len(got & truth)}/{len(truth)} lost={len(lost)}")

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
    # cost model: probe-side explode factor = 1 + _RAD_BITS per row
    print(
        f"probe-side cost multiplier if adopted: x{1 + _RAD_BITS} "
        f"join-left rows (index side unchanged)"
    )
    spark.stop()




def rank_distance_probe() -> None:
    """Follow-up: for the window-missed pairs, how many stride units
    apart do they sit in their best shared bucket? If most are within
    2 strides, a third overlapping window leg (L=3, stride cap/3 —
    same <=cap members per window key, 1.5x join legs) recovers them;
    if they are uniformly spread, only a cap raise would."""
    import sys

    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators.similarity import (
        _NEARDUP_T,
        _RAD_BUCKET_CAP,
        _neardup_lsh_plan,
        dot_fold,
    )
    from workshop3_etl_spark.session import get_spark
    from workshop3_etl_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark(app_name="exp-rankdist")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        F.col("embedding").alias("ev"),
        dot_fold("embedding", "embedding").alias("nrm"),
    ).persist()
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
    lost = truth - got
    # window membership with ranks: strip '#w' and recover w0 per row
    mem = sig.select("vec_id", "table_id", "bucket").collect()
    ranks: dict[tuple[int, str], dict[int, int]] = {}
    for r in mem:
        if "#" not in r["bucket"]:
            continue
        base, w = r["bucket"].rsplit("#", 1)
        key = (r["table_id"], base)
        d = ranks.setdefault(key, {})
        # each row appears as w0 and w0+1; keep the MIN = w0
        d[r["vec_id"]] = min(d.get(r["vec_id"], 1 << 30), int(w))
    from collections import Counter

    dist = Counter()
    for a, b in lost:
        best = None
        for key, d in ranks.items():
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
    import sys
    if "--rankdist" in sys.argv:
        rank_distance_probe()
    else:
        main()

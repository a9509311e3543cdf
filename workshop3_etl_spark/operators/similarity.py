"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

The LLM-pipeline ANN family (BASELINE.json north star):

- brute-force cosine top-k — the exactness baseline
- all-pairs near-duplicate detection above a cosine threshold
- LSH-bucketed ANN (random hyperplanes) — the scale path, validated
  against brute force in tests/test_similarity.py

Determinism: dot products are sums of per-element double products,
each product cast to decimal(20,12) (rounding identical on both
engines, rule 2 of functions/metrics.py) and summed exactly — so
cosine values, and therefore rankings, are bit-identical. Per-element
products use explode + groupBy(pair) rather than a fold so the plan is
a plain vectorized aggregate.

Scale notes:
- Brute force is O(Q x N x d): fine for reranking candidate sets,
  never the full corpus. The broadcast side is the query set.
- LSH hyperplane signatures are map-only (one pass over vectors);
  bucket join + within-bucket rerank is the standard recall/latency
  dial (more tables/bits). An IVF variant would k-means the corpus
  and probe nearest centroids — same join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from workshop3_etl_spark.plans.registry import register
from workshop3_etl_spark.sources.tables import load_table

_N_QUERIES = 5  # vec_id < 5 are the query vectors
_TOP_K = 10
# 4 bits x 8 tables: tuned for the testdata's weak similarity
# structure (true top-10 neighbors sit at cosine ~0.25-0.4, where the
# per-bit sign-agreement probability is only ~0.6, so short band
# signatures + many tables is the recall-preserving configuration;
# tight-duplicate corpora would invert the dial to more bits, fewer
# tables).
_N_HYPERPLANES = 4  # LSH signature bits per table
_N_TABLES = 8  # independent hash tables (OR-amplification)


def _dot_decimal_duck(a: str, b: str) -> str:
    """Exact-decimal dot product of two float lists (DuckDB)."""
    return (
        f"CAST((SELECT SUM(CAST(CAST(x.{a}[x.i] AS DOUBLE)"
        f" * CAST(x.{b}[x.i] AS DOUBLE) AS decimal(20,12)))"
        f" FROM (SELECT unnest(generate_series(1, len({a}))) AS i,"
        f" {a} AS {a}, {b} AS {b}) x) AS DOUBLE)"
    )


_TOPK_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id < {_N_QUERIES}
),
c AS (
  SELECT vec_id AS candidate_id, label AS candidate_label,
         embedding AS cv
  FROM embeddings
),
pairs AS (
  SELECT
    q.query_id,
    c.candidate_id,
    c.candidate_label,
    CAST((SELECT SUM(CAST(CAST(qv[i.i] AS DOUBLE) * CAST(cv[i.i] AS DOUBLE)
                          AS decimal(20,12)))
          FROM (SELECT unnest(generate_series(1, len(qv))) AS i) i) AS DOUBLE)
      AS dot,
    CAST((SELECT SUM(CAST(CAST(qv[i.i] AS DOUBLE) * CAST(qv[i.i] AS DOUBLE)
                          AS decimal(20,12)))
          FROM (SELECT unnest(generate_series(1, len(qv))) AS i) i) AS DOUBLE)
      AS qn,
    CAST((SELECT SUM(CAST(CAST(cv[i.i] AS DOUBLE) * CAST(cv[i.i] AS DOUBLE)
                          AS decimal(20,12)))
          FROM (SELECT unnest(generate_series(1, len(cv))) AS i) i) AS DOUBLE)
      AS cn
  FROM q, c
  WHERE q.query_id <> c.candidate_id
),
ranked AS (
  SELECT
    query_id,
    candidate_id,
    candidate_label,
    dot / (SQRT(qn) * SQRT(cn)) AS cosine_sim,
    ROW_NUMBER() OVER (
      PARTITION BY query_id
      ORDER BY dot / (SQRT(qn) * SQRT(cn)) DESC, candidate_id
    ) AS rank
  FROM pairs
)
SELECT query_id, CAST(rank AS INT) AS rank, candidate_id, candidate_label,
       cosine_sim
FROM ranked
WHERE rank <= {_TOP_K}
ORDER BY query_id, rank
"""


def _norms(df: DataFrame, vec: str, out: str) -> DataFrame:
    """Exact-decimal squared norm via posexplode + groupBy."""
    key = [c for c in df.columns if c != vec]
    exploded = df.select(*key, F.posexplode(vec).alias("i", "x"))
    prod = (F.col("x").cast("double") * F.col("x").cast("double")).cast(
        "decimal(20,12)"
    )
    return (
        exploded.groupBy(*key)
        .agg(F.sum(prod).cast("double").alias(out))
    )


@register("sim_cosine_topk_bruteforce", oracle=_TOPK_ORACLE)
def sim_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for the first 5 query vectors.

    Plan: broadcast the query set against all candidates, posexplode
    the zipped element products into a (query, candidate) groupBy —
    one vectorized aggregate, no Python. Rank with a window
    partitioned by query.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(
        F.col("vec_id").alias("candidate_id"),
        F.col("label").alias("candidate_label"),
        F.col("embedding").alias("cv"),
    )
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("candidate_id"))
        .select(
            "query_id",
            "candidate_id",
            "candidate_label",
            F.posexplode(F.zip_with("qv", "cv", lambda x, y: x.cast("double") * y.cast("double"))).alias("i", "p"),
            F.col("qv"),
            F.col("cv"),
        )
        .groupBy("query_id", "candidate_id", "candidate_label")
        .agg(
            F.sum(F.col("p").cast("decimal(20,12)")).cast("double").alias("dot"),
        )
    )
    qn = _norms(q.select("query_id", F.col("qv").alias("v")), "v", "qn")
    cn = _norms(
        c.select("candidate_id", F.col("cv").alias("v")).withColumnRenamed(
            "candidate_id", "candidate_id"
        ),
        "v",
        "cn",
    )
    from pyspark.sql import Window

    sim = (
        pairs.join(F.broadcast(qn), "query_id")
        .join(cn, "candidate_id")
        .select(
            "query_id",
            "candidate_id",
            "candidate_label",
            (F.col("dot") / (F.sqrt("qn") * F.sqrt("cn"))).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("candidate_id")
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "rank", "candidate_id", "candidate_label", "cosine_sim")
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------
# Label-blocked near-duplicate pairs above a cosine threshold
# (embedding-cosine near-dup — the dedup-by-embedding operator).
# --------------------------------------------------------------------

_NEARDUP_ORACLE = """
WITH v AS (
  SELECT vec_id, label, embedding AS ev FROM embeddings
),
pairs AS (
  SELECT
    a.label,
    a.vec_id AS vec_a,
    b.vec_id AS vec_b,
    CAST((SELECT SUM(CAST(CAST(a.ev[i.i] AS DOUBLE) * CAST(b.ev[i.i] AS DOUBLE)
                          AS decimal(20,12)))
          FROM (SELECT unnest(generate_series(1, len(a.ev))) AS i) i) AS DOUBLE)
      AS dot,
    CAST((SELECT SUM(CAST(CAST(a.ev[i.i] AS DOUBLE) * CAST(a.ev[i.i] AS DOUBLE)
                          AS decimal(20,12)))
          FROM (SELECT unnest(generate_series(1, len(a.ev))) AS i) i) AS DOUBLE)
      AS na,
    CAST((SELECT SUM(CAST(CAST(b.ev[i.i] AS DOUBLE) * CAST(b.ev[i.i] AS DOUBLE)
                          AS decimal(20,12)))
          FROM (SELECT unnest(generate_series(1, len(b.ev))) AS i) i) AS DOUBLE)
      AS nb
  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT
  label,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(SUM(CASE WHEN dot / (SQRT(na) * SQRT(nb)) >= 0.9 THEN 1 ELSE 0 END)
       AS BIGINT) AS n_above_090,
  CAST(SUM(CASE WHEN dot / (SQRT(na) * SQRT(nb)) >= 0.99 THEN 1 ELSE 0 END)
       AS BIGINT) AS n_above_099
FROM pairs
GROUP BY label
ORDER BY label
"""


@register("sim_embedding_neardup_blocked", oracle=_NEARDUP_ORACLE)
def sim_embedding_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-label cosine near-dup counts (label as blocking key —
    production swaps in LSH buckets for the block)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").alias("ev")
    )
    a = emb.alias("a")
    b = emb.alias("b")
    joined = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.label").alias("label"),
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.posexplode(
            F.zip_with("a.ev", "b.ev", lambda x, y: x.cast("double") * y.cast("double"))
        ).alias("i", "p_ab"),
        F.col("a.ev").alias("av"),
        F.col("b.ev").alias("bv"),
    )
    prods = joined.select(
        "label",
        "vec_a",
        "vec_b",
        F.col("p_ab").cast("decimal(20,12)").alias("p_ab"),
        (F.element_at("av", F.col("i") + 1).cast("double")
         * F.element_at("av", F.col("i") + 1).cast("double"))
        .cast("decimal(20,12)")
        .alias("p_aa"),
        (F.element_at("bv", F.col("i") + 1).cast("double")
         * F.element_at("bv", F.col("i") + 1).cast("double"))
        .cast("decimal(20,12)")
        .alias("p_bb"),
    )
    sums = prods.groupBy("label", "vec_a", "vec_b").agg(
        F.sum("p_ab").cast("double").alias("dot"),
        F.sum("p_aa").cast("double").alias("na"),
        F.sum("p_bb").cast("double").alias("nb"),
    )
    cos = F.col("dot") / (F.sqrt("na") * F.sqrt("nb"))
    return (
        sums.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum((cos >= 0.9).cast("int")).cast("long").alias("n_above_090"),
            F.sum((cos >= 0.99).cast("int")).cast("long").alias("n_above_099"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------
# LSH-bucketed ANN (random hyperplanes) — the scale path.
# --------------------------------------------------------------------

def _hyperplanes(dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (hash-derived, no RNG
    state — reproducible across drivers/executors/runs)."""
    import hashlib
    import struct

    planes = []
    for t in range(_N_TABLES):
        for h in range(_N_HYPERPLANES):
            vals = []
            for d in range(dim):
                digest = hashlib.md5(f"{seed}:{t}:{h}:{d}".encode()).digest()
                # uniform in [-0.5, 0.5)
                vals.append(struct.unpack("<Q", digest[:8])[0] / 2**64 - 0.5)
            planes.append(vals)
    return planes


def lsh_signatures(df: DataFrame, vec_col: str, dim: int = 64) -> DataFrame:
    """Add (table_id, bucket) signature rows per vector: sign pattern
    of _N_HYPERPLANES dot products per table. Map-only — one pass, no
    shuffle; the bucket string is the join key downstream."""
    planes = _hyperplanes(dim)
    out = df
    bits = []
    for i, plane in enumerate(planes):
        arr = "array(" + ", ".join(repr(v) for v in plane) + ")"
        dot = F.expr(
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> CAST(x AS DOUBLE) * y),"
            f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        bits.append(F.when(dot >= 0, "1").otherwise("0").alias(f"bit{i}"))
    out = out.select("*", *bits)
    tables = None
    for t in range(_N_TABLES):
        bucket = F.concat(
            *[F.col(f"bit{t * _N_HYPERPLANES + h}") for h in range(_N_HYPERPLANES)]
        )
        part = out.select(
            *df.columns, F.lit(t).alias("table_id"), bucket.alias("bucket")
        )
        tables = part if tables is None else tables.unionByName(part)
    return tables


@register("sim_ann_lsh_topk", oracle=None)
def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k: LSH candidate generation (4 tables x
    8 hyperplane bits) + exact rerank within candidates.

    Rows-only check (the bucketing isn't SQL-portable);
    tests/test_similarity.py measures recall vs the brute-force
    baseline. At corpus scale the bucket join touches only colliding
    candidates — the classic sublinear ANN trade: more tables = more
    recall, longer buckets = more rerank cost.
    """
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    # Materialize the signature table (vec_id, table_id, bucket) —
    # in production this IS a persisted index artifact; here it also
    # keeps the 32 hyperplane fold-expressions from being re-inlined
    # into every branch of the self-join plan.
    sigs = (
        lsh_signatures(emb.select("vec_id", F.col("embedding").alias("v")), "v")
        .select("vec_id", "table_id", "bucket")
        .persist()
    )
    sigs.count()  # force the index build
    q = sigs.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "table_id", "bucket"
    )
    c = sigs.select(F.col("vec_id").alias("candidate_id"), "table_id", "bucket")
    # bucket join carries only ids — vectors re-attach for the rerank
    cand_ids = (
        q.join(c, ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("candidate_id"))
        .select("query_id", "candidate_id")
        .distinct()
    )
    qvec = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cvec = emb.select(
        F.col("vec_id").alias("candidate_id"), F.col("embedding").alias("cv")
    )
    cands = cand_ids.join(F.broadcast(qvec), "query_id").join(cvec, "candidate_id")
    # exact rerank (same decimal-dot determinism as brute force)
    prods = cands.select(
        "query_id",
        "candidate_id",
        F.posexplode(
            F.zip_with("qv", "cv", lambda x, y: x.cast("double") * y.cast("double"))
        ).alias("i", "p"),
        "qv",
        "cv",
    ).select(
        "query_id",
        "candidate_id",
        F.col("p").cast("decimal(20,12)").alias("p"),
        (F.element_at("qv", F.col("i") + 1).cast("double")
         * F.element_at("qv", F.col("i") + 1).cast("double"))
        .cast("decimal(20,12)").alias("pq"),
        (F.element_at("cv", F.col("i") + 1).cast("double")
         * F.element_at("cv", F.col("i") + 1).cast("double"))
        .cast("decimal(20,12)").alias("pc"),
    )
    sums = prods.groupBy("query_id", "candidate_id").agg(
        F.sum("p").cast("double").alias("dot"),
        F.sum("pq").cast("double").alias("qn"),
        F.sum("pc").cast("double").alias("cn"),
    )
    sim = sums.select(
        "query_id",
        "candidate_id",
        (F.col("dot") / (F.sqrt("qn") * F.sqrt("cn"))).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("candidate_id")
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "rank", "candidate_id", "cosine_sim")
        .orderBy("query_id", "rank")
    )

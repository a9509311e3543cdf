"""Distinct-count / similarity / quantile SKETCHES — the approximate
operators a 100 TB profiling pass actually runs (exact COUNT(DISTINCT)
over billions of keys is a full shuffle of every key; a sketch is a
few KB per partition and map-side combinable).

Two tiers, mirroring how production engines expose sketches:

1. **Deterministic KMV (K-minimum-values) sketches** built from an
   explicit universal hash ``((key % p) * a + b) % p`` over the
   Mersenne prime p = 2^31 - 1. Because the hash is plain 64-bit
   integer arithmetic, DuckDB reproduces it bit-for-bit, so these
   queries are full hash-compare oracled — the estimator itself is
   checked cross-engine, not just "close enough". Intermediates are
   bounded by (p-1)*a < 2^62, so the arithmetic never overflows
   BIGINT at any key magnitude (keys are reduced mod p first).
2. **Native sketches** (Spark HyperLogLog++ `approx_count_distinct`,
   `approx_percentile`) checked at the *contract* level: each engine
   runs its own sketch and the query surfaces whether the estimate
   lands within the documented error bound of the exact answer. The
   oracle is DuckDB's own approx aggregates under the same bound —
   both engines independently assert the same semantic contract
   (booleans hash-compare), since the raw estimates are
   algorithm-specific and cannot match across engines.

Scale notes (100 TB):
- The KMV build is `distinct` over a 4-byte hash domain (≤ p values)
  followed by TakeOrdered(k) — partial dedup map-side, per-partition
  k-heaps, one narrow shuffle; no payload ever moves.
- Estimator math happens on a k-row frame (driver-trivial).
- The union/Jaccard sketch composes by unioning hash sets BEFORE the
  k-cut, which is exactly how KMV/theta sketches merge on a
  combiner tree; per-set membership flags ride along as 0/1 ints.

Reference parity: the reference has no sketch surface (pandas
`nunique()` at `src/eda.py` scale); this family is part of the
training-data-pipeline extension mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from workshop3_etl_spark.plans.registry import register
from workshop3_etl_spark.sources.tables import load_table

# Universal hash constants. p is the Mersenne prime 2^31-1; a, b are
# the classic glibc LCG multiplier/increment (public constants). Any
# (a, b) with 0 < a < p works; fixed values make both engines and
# every rerun produce identical sketches.
HASH_P = 2_147_483_647
HASH_A = 1_103_515_245
HASH_B = 12_345

# One SQL snippet, used VERBATIM by both the Spark plan (F.expr) and
# the DuckDB oracle — the cross-engine contract is the text itself.
def hash_sql(key: str) -> str:
    return f"((({key} % {HASH_P}) * {HASH_A} + {HASH_B}) % {HASH_P})"


KMV_K = 256  # ~1/sqrt(k) ≈ 6% standard error


# --------------------------------------------------------------------
# KMV distinct-count sketch (oracled bit-identical).
# --------------------------------------------------------------------

_KMV_DISTINCT_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT {hash_sql('l_orderkey')} AS hv FROM lineitem
),
kmin AS (
  SELECT hv FROM h ORDER BY hv LIMIT {KMV_K}
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS kmv_k,
         CAST(MAX(hv) AS BIGINT) AS kth_min_hash
  FROM kmin
),
e AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
  FROM lineitem
)
SELECT
  e.exact_distinct,
  s.kmv_k,
  s.kth_min_hash,
  CASE WHEN s.kmv_k < {KMV_K} THEN CAST(s.kmv_k AS DOUBLE)
       ELSE CAST({KMV_K - 1} AS DOUBLE) * CAST({HASH_P} AS DOUBLE)
            / CAST(s.kth_min_hash AS DOUBLE)
  END AS kmv_estimate,
  ABS(
    CASE WHEN s.kmv_k < {KMV_K} THEN CAST(s.kmv_k AS DOUBLE)
         ELSE CAST({KMV_K - 1} AS DOUBLE) * CAST({HASH_P} AS DOUBLE)
              / CAST(s.kth_min_hash AS DOUBLE)
    END - CAST(e.exact_distinct AS DOUBLE)
  ) / CAST(e.exact_distinct AS DOUBLE) AS rel_error
FROM s, e
"""


@register("sketch_kmv_distinct_orderkeys", oracle=_KMV_DISTINCT_ORACLE)
def sketch_kmv_distinct_orderkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count estimate of lineitem.l_orderkey vs exact.

    Plan: hash → distinct (narrow int column, map-side partial dedup)
    → TakeOrdered(k) → single-row estimator math. The exact
    COUNT(DISTINCT) rides the same scan for the comparison column.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    hv = li.select(F.expr(hash_sql("l_orderkey")).alias("hv")).distinct()
    kmin = hv.orderBy("hv").limit(KMV_K)
    s = kmin.agg(
        F.count(F.lit(1)).alias("kmv_k"),
        F.max("hv").cast("long").alias("kth_min_hash"),
    )
    e = li.agg(F.count_distinct("l_orderkey").alias("exact_distinct"))
    est = (
        F.when(
            F.col("kmv_k") < KMV_K, F.col("kmv_k").cast("double")
        ).otherwise(
            F.lit(float(KMV_K - 1))
            * F.lit(float(HASH_P))
            / F.col("kth_min_hash").cast("double")
        )
    )
    return s.crossJoin(F.broadcast(e)).select(
        F.col("exact_distinct"),
        F.col("kmv_k"),
        F.col("kth_min_hash"),
        est.alias("kmv_estimate"),
        (
            F.abs(est - F.col("exact_distinct").cast("double"))
            / F.col("exact_distinct").cast("double")
        ).alias("rel_error"),
    )


# --------------------------------------------------------------------
# KMV union / intersection / Jaccard between two key sets
# (theta-sketch-style set algebra, oracled bit-identical).
# --------------------------------------------------------------------

_KMV_JACCARD_ORACLE = f"""
WITH o AS (
  SELECT o_custkey, YEAR(o_orderdate) AS y
  FROM orders
  WHERE YEAR(o_orderdate) IN (1995, 1996)
),
f AS (
  SELECT {hash_sql('o_custkey')} AS hv,
         MAX(CASE WHEN y = 1995 THEN 1 ELSE 0 END) AS in_x,
         MAX(CASE WHEN y = 1996 THEN 1 ELSE 0 END) AS in_y
  FROM o GROUP BY 1
),
u AS (
  SELECT hv, in_x, in_y FROM f ORDER BY hv LIMIT {KMV_K}
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS kmv_k,
         CAST(MAX(hv) AS BIGINT) AS kth_min_hash,
         CAST(SUM(in_x * in_y) AS BIGINT) AS kmv_n_both
  FROM u
),
e AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
         CAST(SUM(CASE WHEN hx = 1 AND hy = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS exact_intersection
  FROM (
    SELECT o_custkey,
           MAX(CASE WHEN y = 1995 THEN 1 ELSE 0 END) AS hx,
           MAX(CASE WHEN y = 1996 THEN 1 ELSE 0 END) AS hy
    FROM o GROUP BY 1
  )
)
SELECT
  e.exact_union,
  e.exact_intersection,
  CAST(e.exact_intersection AS DOUBLE) / CAST(e.exact_union AS DOUBLE)
    AS exact_jaccard,
  s.kmv_k,
  s.kmv_n_both,
  CAST(s.kmv_n_both AS DOUBLE) / CAST(s.kmv_k AS DOUBLE) AS kmv_jaccard_est,
  CASE WHEN s.kmv_k < {KMV_K} THEN CAST(s.kmv_k AS DOUBLE)
       ELSE CAST({KMV_K - 1} AS DOUBLE) * CAST({HASH_P} AS DOUBLE)
            / CAST(s.kth_min_hash AS DOUBLE)
  END AS kmv_union_est
FROM s, e
"""


@register("sketch_kmv_jaccard_custkeys", oracle=_KMV_JACCARD_ORACLE)
def sketch_kmv_jaccard_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta set algebra: union size, intersection share and
    Jaccard between the 1995 and 1996 active-customer sets.

    The k smallest hashes of the UNION carry per-set membership flags;
    Jaccard = share of those flagged in both. This is exactly how KMV
    sketches merge across partitions/sets at scale — the k-cut happens
    after the hash-set union, and only (hash, flag) pairs move.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", F.year("o_orderdate").alias("y"))
        .filter(F.col("y").isin(1995, 1996))
    )
    f = o.groupBy(F.expr(hash_sql("o_custkey")).alias("hv")).agg(
        F.max(F.when(F.col("y") == 1995, 1).otherwise(0)).alias("in_x"),
        F.max(F.when(F.col("y") == 1996, 1).otherwise(0)).alias("in_y"),
    )
    u = f.orderBy("hv").limit(KMV_K)
    s = u.agg(
        F.count(F.lit(1)).alias("kmv_k"),
        F.max("hv").cast("long").alias("kth_min_hash"),
        F.sum(F.col("in_x") * F.col("in_y")).cast("long").alias("kmv_n_both"),
    )
    e = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("y") == 1995, 1).otherwise(0)).alias("hx"),
            F.max(F.when(F.col("y") == 1996, 1).otherwise(0)).alias("hy"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("exact_union"),
            F.sum(
                F.when((F.col("hx") == 1) & (F.col("hy") == 1), 1).otherwise(0)
            )
            .cast("long")
            .alias("exact_intersection"),
        )
    )
    return s.crossJoin(F.broadcast(e)).select(
        "exact_union",
        "exact_intersection",
        (
            F.col("exact_intersection").cast("double")
            / F.col("exact_union").cast("double")
        ).alias("exact_jaccard"),
        "kmv_k",
        "kmv_n_both",
        (
            F.col("kmv_n_both").cast("double") / F.col("kmv_k").cast("double")
        ).alias("kmv_jaccard_est"),
        F.when(F.col("kmv_k") < KMV_K, F.col("kmv_k").cast("double"))
        .otherwise(
            F.lit(float(KMV_K - 1))
            * F.lit(float(HASH_P))
            / F.col("kth_min_hash").cast("double")
        )
        .alias("kmv_union_est"),
    )


# --------------------------------------------------------------------
# Deterministic hash-threshold sample → exact quantiles over the
# sample (the scale path for quantile profiling: the full-data exact
# quantile needs a global sort; the sampled one reads ~10% and the
# sample is REPRODUCIBLE, not rand()-dependent).
# --------------------------------------------------------------------

# l_linenumber ∈ [1,7] so (l_orderkey * 8 + l_linenumber) is a unique
# row key in pure integer arithmetic at any SF.
_ROWKEY = "(l_orderkey * 8 + l_linenumber)"
_SAMPLE_DEN = 10  # keep hv in the lowest 1/10 of the hash range

_SAMPLED_QUANTILE_ORACLE = f"""
WITH s AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS price
  FROM lineitem
  WHERE {hash_sql(_ROWKEY)} * {_SAMPLE_DEN} < {HASH_P}
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS sample_n,
  quantile_cont(price, 0.25) AS q25,
  quantile_cont(price, 0.50) AS q50,
  quantile_cont(price, 0.75) AS q75,
  quantile_cont(price, 0.95) AS q95
FROM s
"""


@register("sketch_sampled_quantiles_price", oracle=_SAMPLED_QUANTILE_ORACLE)
def sketch_sampled_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles over a deterministic ~10% sample.

    The sample predicate is a pure-integer hash threshold on a unique
    row key — map-only, pushdown-friendly, identical row set in every
    engine/run (unlike ``TABLESAMPLE``/``rand()``). Spark
    ``percentile`` == DuckDB ``quantile_cont`` bit-for-bit on the same
    input set (A8-established parity).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    s = li.filter(
        F.expr(f"{hash_sql(_ROWKEY)} * {_SAMPLE_DEN} < {HASH_P}")
    ).select(F.col("l_extendedprice").cast("double").alias("price"))
    return s.agg(
        F.count(F.lit(1)).alias("sample_n"),
        F.expr("percentile(price, 0.25)").alias("q25"),
        F.expr("percentile(price, 0.50)").alias("q50"),
        F.expr("percentile(price, 0.75)").alias("q75"),
        F.expr("percentile(price, 0.95)").alias("q95"),
    )


# --------------------------------------------------------------------
# Native sketches, contract-level oracle: each engine runs ITS OWN
# HLL / approx-quantile implementation and asserts the estimate lands
# inside the documented error bound of the exact answer. The surfaced
# booleans (plus the exact references) hash-compare; the raw
# estimates are engine-specific by nature and are not surfaced.
# --------------------------------------------------------------------

_NATIVE_BOUND_ORACLE = """
WITH m AS (
  SELECT
    CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct,
    approx_count_distinct(l_orderkey) AS approx_d,
    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS exact_median,
    approx_quantile(CAST(l_extendedprice AS DOUBLE), 0.5) AS approx_m
  FROM lineitem
)
SELECT
  exact_distinct,
  ABS(CAST(approx_d AS DOUBLE) - CAST(exact_distinct AS DOUBLE))
    / CAST(exact_distinct AS DOUBLE) < 0.05 AS hll_within_5pct,
  ABS(approx_m - exact_median) / exact_median < 0.05
    AS median_within_5pct
FROM m
"""


@register("sketch_native_approx_bounds", oracle=_NATIVE_BOUND_ORACLE)
def sketch_native_approx_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct count and approx-percentile median,
    asserted against their error contracts (±5% of exact).

    Raw HLL registers differ engine to engine, so the cross-engine
    check is the CONTRACT: both engines surface `estimate within 5%
    of exact` booleans plus the exact distinct count. Spark side uses
    rsd=0.01 (±1% target) and accuracy=10000 — well inside the bound.
    """
    li = load_table(spark, sf_dir, "lineitem")
    m = li.agg(
        F.count_distinct("l_orderkey").alias("exact_distinct"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_d"),
        F.expr(
            "percentile(CAST(l_extendedprice AS DOUBLE), 0.5)"
        ).alias("exact_median"),
        F.expr(
            "approx_percentile(CAST(l_extendedprice AS DOUBLE), 0.5, 10000)"
        ).alias("approx_m"),
    )
    return m.select(
        "exact_distinct",
        (
            F.abs(
                F.col("approx_d").cast("double")
                - F.col("exact_distinct").cast("double")
            )
            / F.col("exact_distinct").cast("double")
            < 0.05
        ).alias("hll_within_5pct"),
        (
            F.abs(F.col("approx_m") - F.col("exact_median"))
            / F.col("exact_median")
            < 0.05
        ).alias("median_within_5pct"),
    )


# --------------------------------------------------------------------
# GROUPED KMV: one sketch per group in a single pass — how a sketch
# actually deploys in a profiling job (distinct customers per year
# without one exact COUNT(DISTINCT) shuffle per group).
# --------------------------------------------------------------------

_KMV_BY_YEAR_K = 64

_KMV_BY_YEAR_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT YEAR(o_orderdate) AS y,
         {hash_sql('o_custkey')} AS hv
  FROM orders
),
r AS (
  SELECT y, hv,
         ROW_NUMBER() OVER (PARTITION BY y ORDER BY hv) AS rn
  FROM h
),
s AS (
  SELECT y,
         CAST(COUNT(*) AS BIGINT) AS kmv_k,
         CAST(MAX(hv) AS BIGINT) AS kth_min_hash
  FROM r WHERE rn <= {_KMV_BY_YEAR_K}
  GROUP BY y
),
e AS (
  SELECT YEAR(o_orderdate) AS y,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
  FROM orders GROUP BY 1
)
SELECT
  s.y AS order_year,
  e.exact_distinct,
  s.kmv_k,
  CASE WHEN s.kmv_k < {_KMV_BY_YEAR_K} THEN CAST(s.kmv_k AS DOUBLE)
       ELSE CAST({_KMV_BY_YEAR_K - 1} AS DOUBLE) * CAST({HASH_P} AS DOUBLE)
            / CAST(s.kth_min_hash AS DOUBLE)
  END AS kmv_estimate
FROM s JOIN e ON s.y = e.y
ORDER BY order_year
"""


@register("sketch_kmv_distinct_by_year", oracle=_KMV_BY_YEAR_ORACLE)
def sketch_kmv_distinct_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year KMV distinct-customer estimates vs exact, one pass.

    The k-cut per group is a PARTITIONED row_number over the deduped
    (group, hash) pairs — every window and shuffle is keyed by the
    group, so adding groups adds no coordination. The exact counts
    ride along for the comparison column only.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("y"), "o_custkey"
    )
    h = o.select("y", F.expr(hash_sql("o_custkey")).alias("hv")).distinct()
    wk = Window.partitionBy("y").orderBy("hv")
    s = (
        h.select("y", "hv", F.row_number().over(wk).alias("rn"))
        .filter(F.col("rn") <= _KMV_BY_YEAR_K)
        .groupBy("y")
        .agg(
            F.count(F.lit(1)).alias("kmv_k"),
            F.max("hv").cast("long").alias("kth_min_hash"),
        )
    )
    e = o.groupBy("y").agg(
        F.count_distinct("o_custkey").alias("exact_distinct")
    )
    est = F.when(
        F.col("kmv_k") < _KMV_BY_YEAR_K, F.col("kmv_k").cast("double")
    ).otherwise(
        F.lit(float(_KMV_BY_YEAR_K - 1))
        * F.lit(float(HASH_P))
        / F.col("kth_min_hash").cast("double")
    )
    return (
        s.join(e, "y")
        .select(
            F.col("y").alias("order_year"),
            "exact_distinct",
            "kmv_k",
            est.alias("kmv_estimate"),
        )
        .orderBy("order_year")
    )


# --------------------------------------------------------------------
# ROLLING sketch merge: trailing-7-day distinct users per day, via
# per-day KMV sketches unioned over a window — the mergeability
# property (min-k of a union ⊆ union of per-set min-ks) is what makes
# KMV composable across arbitrary frames, which no exact
# COUNT(DISTINCT) OVER (...) can do distributed (neither Spark nor
# DuckDB even supports it).
# --------------------------------------------------------------------

_ROLL_K = 64

_KMV_ROLLING_ORACLE = f"""
WITH dh AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d,
         {hash_sql('user_id')} AS hv
  FROM events
),
r AS (
  SELECT d, hv, ROW_NUMBER() OVER (PARTITION BY d ORDER BY hv) AS rn
  FROM dh
),
ka AS (
  SELECT d, list_sort(list(hv)) AS karr FROM r WHERE rn <= {_ROLL_K}
  GROUP BY d
),
fa AS (
  SELECT d, list_sort(list(hv)) AS farr FROM dh GROUP BY d
),
day AS (SELECT ka.d AS d, ka.karr, fa.farr FROM ka JOIN fa ON ka.d = fa.d),
roll AS (
  SELECT d,
         flatten(list(karr) OVER w) AS uk_raw,
         flatten(list(farr) OVER w) AS uf_raw
  FROM day
  WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
),
s AS (
  SELECT d,
         list_sort(list_distinct(uk_raw)) AS uk,
         CAST(len(list_distinct(uf_raw)) AS BIGINT) AS exact_trailing
  FROM roll
)
SELECT
  d AS day,
  exact_trailing,
  CASE WHEN len(uk) < {_ROLL_K} THEN CAST(len(uk) AS DOUBLE)
       ELSE (CAST({_ROLL_K - 1} AS DOUBLE) * CAST({HASH_P} AS DOUBLE))
            / CAST(uk[{_ROLL_K}] AS DOUBLE)
  END AS kmv_trailing_est
FROM s
ORDER BY day
"""


@register("sketch_kmv_rolling_users_7d", oracle=_KMV_ROLLING_ORACLE)
def sketch_kmv_rolling_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct-user estimate per day by merging
    per-day KMV sketches over a rolling window.

    Scale shape: the fact table reduces to one ≤k-element sorted hash
    array per day (partitioned k-cut, map-side distinct); the rolling
    union then runs on the day spine — tiny regardless of corpus
    size — so the only unpartitioned window is over ~n_days rows.
    The exact_trailing column flattens FULL per-day user sets for the
    comparison; that column is test-scale instrumentation — the
    production artifact is the sketch path, which is why this exists.
    """
    ev = load_table(spark, sf_dir, "events")
    dh = ev.select(
        F.to_date("ts").alias("d"),
        F.expr(hash_sql("user_id")).alias("hv"),
    ).distinct()
    wd = Window.partitionBy("d").orderBy("hv")
    ka = (
        dh.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= _ROLL_K)
        .groupBy("d")
        .agg(F.sort_array(F.collect_list("hv")).alias("karr"))
    )
    fa = dh.groupBy("d").agg(
        F.sort_array(F.collect_list("hv")).alias("farr")
    )
    day = ka.join(fa, "d")
    wr = Window.orderBy("d").rowsBetween(-6, 0)  # day spine: tiny
    roll = day.select(
        "d",
        F.flatten(F.collect_list("karr").over(wr)).alias("uk_raw"),
        F.flatten(F.collect_list("farr").over(wr)).alias("uf_raw"),
    )
    s = roll.select(
        "d",
        F.array_sort(F.array_distinct("uk_raw")).alias("uk"),
        F.size(F.array_distinct("uf_raw")).cast("long").alias("exact_trailing"),
    )
    est = F.when(
        F.size("uk") < _ROLL_K, F.size("uk").cast("double")
    ).otherwise(
        (F.lit(float(_ROLL_K - 1)) * F.lit(float(HASH_P)))
        / F.element_at("uk", _ROLL_K).cast("double")
    )
    return s.select(
        F.col("d").alias("day"),
        "exact_trailing",
        est.alias("kmv_trailing_est"),
    ).orderBy("day")


# --------------------------------------------------------------------
# Explicit-register HyperLogLog: the classic m=256 register array
# built from first principles on BOTH engines — bucket = low 8 hash
# bits, rho = leading-zero rank of the remaining 52 bits — so unlike
# the native approx_count_distinct (engine-specific sketch, checked
# only at the error-contract level in sketch_native_approx_bounds),
# every intermediate here is an INTEGER and the whole query is
# bit-identical cross-engine: registers are max() of integer ranks,
# and the harmonic denominator sum(2^-M_b) is carried as the exact
# integer sum(2^(53-M_b)) (<= 256 * 2^53 = 2^61, fits bigint).
# --------------------------------------------------------------------

HLL_M = 256


def hll_register_oracle(table: str, key: str) -> str:
    """DuckDB twin of the explicit-register HLL summary, parameterized
    on (table, key) so the batch query (orders, o_custkey) and the
    streaming-maintenance query (events, user_id) assert the SAME
    register arithmetic from one definition."""
    return f"""
WITH h AS (
  SELECT CAST(CAST(concat('0x',
         substr(md5(CAST({key} AS VARCHAR)), 1, 15)) AS BIGINT)
         AS BIGINT) AS hv
  FROM {table}
),
bw AS (
  SELECT hv % {HLL_M} AS b, hv // {HLL_M} AS w FROM h
),
r AS (
  SELECT b,
         MAX(CASE WHEN w = 0 THEN 53
             ELSE 53 - length(ltrim(bin(w), '0')) END) AS m_b
  FROM bw GROUP BY b
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_filled,
         CAST(SUM(m_b) AS BIGINT) AS register_sum,
         CAST(SUM(CAST(1 AS BIGINT) << (53 - m_b)) AS BIGINT) AS s_filled
  FROM r
),
ex AS (
  SELECT CAST(COUNT(DISTINCT {key}) AS BIGINT) AS exact_distinct
  FROM {table}
)
SELECT
  CAST({HLL_M} AS BIGINT) AS m,
  CAST({HLL_M} - n_filled AS BIGINT) AS n_zero_registers,
  register_sum,
  s_filled + ({HLL_M} - n_filled) * (CAST(1 AS BIGINT) << 53) AS s_scaled,
  (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
    * 9007199254740992.0
    / CAST(s_filled + ({HLL_M} - n_filled) * (CAST(1 AS BIGINT) << 53)
           AS DOUBLE) AS hll_estimate,
  exact_distinct
FROM agg CROSS JOIN ex
"""


_HLL_REG_ORACLE = hll_register_oracle("orders", "o_custkey")


def hll_register_partial(df: DataFrame, key_col: str) -> DataFrame:
    """The (b, m_b) HLL register partial over ``df``'s rows — THE
    mergeable sketch state: merging partials from ANY partition of
    the input by per-bucket ``max(m_b)`` yields the registers of the
    whole input. ``max`` is commutative, associative, and — unlike
    the CMS counter sum — IDEMPOTENT, so even duplicated inputs
    (an at-least-once upstream) cannot corrupt the merged state.

    One map-only hash/bucket/rank projection + one <=256-group max
    (map-side combinable), so a partial is at most 256 rows no
    matter how many input rows feed it.
    """
    h = df.selectExpr(
        f"cast(conv(substring(md5(cast({key_col} as string)), 1, 15), 16, 10)"
        " as bigint) as hv"
    )
    bw = h.select(
        (F.col("hv") % HLL_M).alias("b"),
        F.expr(f"hv div {HLL_M}").alias("w"),
    )
    return bw.groupBy("b").agg(
        F.max(
            F.when(F.col("w") == 0, F.lit(53)).otherwise(
                F.lit(53) - F.length(F.expr("conv(w, 10, 2)"))
            )
        ).alias("m_b")
    )


def hll_summary(registers: DataFrame, exact: DataFrame) -> DataFrame:
    """One-row HLL summary (zero registers, rank sum, exact-integer
    harmonic denominator, raw estimate) from a (b, m_b) register
    frame plus a 1-row ``exact_distinct`` ride-along. The estimate
    divides exact integers under one literal IEEE expression tree,
    so even the float is bit-identical cross-engine."""
    agg = registers.agg(
        F.count(F.lit(1)).alias("n_filled"),
        F.sum("m_b").cast("long").alias("register_sum"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), cast(53 - m_b as int))"))
        .cast("long")
        .alias("s_filled"),
    )
    s_scaled = F.col("s_filled") + (
        F.lit(HLL_M) - F.col("n_filled")
    ).cast("long") * F.lit(1 << 53).cast("long")
    alpha_num = 0.7213 / (1.0 + 1.079 / float(HLL_M))
    return agg.crossJoin(exact).select(
        F.lit(HLL_M).cast("long").alias("m"),
        (F.lit(HLL_M) - F.col("n_filled")).cast("long").alias(
            "n_zero_registers"
        ),
        "register_sum",
        s_scaled.alias("s_scaled"),
        (
            F.lit(alpha_num)
            * F.lit(float(HLL_M))
            * F.lit(float(HLL_M))
            * F.lit(9007199254740992.0)
            / s_scaled.cast("double")
        ).alias("hll_estimate"),
        "exact_distinct",
    )


@register("sketch_hll_registers_custkeys", oracle=_HLL_REG_ORACLE)
def sketch_hll_registers_custkeys(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HyperLogLog distinct-customer estimate from an explicit
    256-register sketch, next to the exact count: one row with the
    register-array summary (zero registers, rank sum, exact-integer
    harmonic denominator) and the raw HLL estimate.

    One map-only hash/bucket/rank projection, one 256-group max
    (map-side combinable — this IS the mergeable sketch: max per
    register), then scalar arithmetic. The estimate divides exact
    integers under one literal IEEE expression tree, so even the
    float is bit-identical cross-engine. rho uses the binary-string
    length trick (conv/bin) — no log2 anywhere. The raw estimator is
    surfaced without the small-range linear-counting correction
    (which needs ln); n_zero_registers is there so a caller can apply
    it.
    """
    orders = load_table(spark, sf_dir, "orders")
    r = hll_register_partial(orders, "o_custkey")
    ex = orders.agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_distinct")
    )
    return hll_summary(r, ex)


# --------------------------------------------------------------------
# COUNT-MIN SKETCH heavy hitters (oracled bit-identical). CMS is the
# streaming/distributed answer to "which keys are hot and how hot"
# without a per-key exact count: d independent hash rows of w integer
# counters, each counter a plain SUM — order-independent and
# map-side combinable, so the whole sketch is one narrow groupBy that
# outputs at most d*w rows no matter how many input rows (or
# executors) feed it. Point estimate = min over the d rows' counters;
# the one-sided guarantee est >= exact always holds, est <= exact +
# eps*n with prob 1-delta for w = e/eps, d = ln(1/delta).
#
# The candidate keys here are the exact top-10 (ride-along
# verification columns); at 100 TB the candidate set comes from a
# deterministic sample or the previous window's hitters, and the
# sketch — not the exact pass — is what survives.
# --------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 512  # counters per row


def _cms_consts(i: int) -> tuple[int, int]:
    """Per-row universal-hash constants, derived from the module's
    public LCG constants; a_i < p keeps (key % p) * a_i < 2^62."""
    a = (HASH_A * (2 * i + 1)) % HASH_P
    b = (HASH_B + i * 1_000_003) % HASH_P
    return a, b


def cms_bucket_sql(key: str, i: int) -> str:
    """Bucket expression for hash row ``i`` — used VERBATIM by the
    Spark plan and the DuckDB oracle (pure BIGINT arithmetic)."""
    a, b = _cms_consts(i)
    return f"(((({key} % {HASH_P}) * {a} + {b}) % {HASH_P}) % {CMS_W})"


_CMS_TOPK = 10

_CMS_PAIRS_SQL = "\nUNION ALL\n".join(
    f"  SELECT {i} AS i, {cms_bucket_sql('o_custkey', i)} AS bucket"
    " FROM orders"
    for i in range(CMS_D)
)

_CMS_CAND_PAIRS_SQL = "\nUNION ALL\n".join(
    f"  SELECT o_custkey, exact_cnt, {i} AS i,"
    f" {cms_bucket_sql('o_custkey', i)} AS bucket FROM cand"
    for i in range(CMS_D)
)

_CMS_HEAVY_ORACLE = f"""
WITH pairs AS (
{_CMS_PAIRS_SQL}
),
sketch AS (
  SELECT i, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM pairs GROUP BY 1, 2
),
cand AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS exact_cnt
  FROM orders GROUP BY 1
  ORDER BY exact_cnt DESC, o_custkey
  LIMIT {_CMS_TOPK}
),
cp AS (
{_CMS_CAND_PAIRS_SQL}
)
SELECT
  cp.o_custkey,
  cp.exact_cnt,
  CAST(MIN(s.c) AS BIGINT) AS cms_estimate,
  MIN(s.c) >= cp.exact_cnt AS overestimate_ok
FROM cp JOIN sketch s ON s.i = cp.i AND s.bucket = cp.bucket
GROUP BY cp.o_custkey, cp.exact_cnt
ORDER BY exact_cnt DESC, o_custkey
"""


@register("sketch_cms_heavy_custkeys", oracle=_CMS_HEAVY_ORACLE)
def sketch_cms_heavy_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for the top-10 ordering
    customers, with the exact counts and the one-sided overestimate
    guarantee surfaced.

    Plan: ONE scan computes all d bucket columns, ``stack`` unfolds
    them to (row, bucket) pairs (map-only), and the sketch build is a
    single partial-aggregated groupBy bounded at d*w = 2048 output
    rows. The candidate lookup broadcasts the sketch (a few KB) — no
    second shuffle of the data. Exact counts are verification
    ride-alongs; the sketch path never needs them.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    stack_args = ", ".join(
        f"{i}, {cms_bucket_sql('o_custkey', i)}" for i in range(CMS_D)
    )
    pairs = o.select(
        F.expr(f"stack({CMS_D}, {stack_args}) AS (i, bucket)")
    )
    sketch = pairs.groupBy("i", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cand = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "o_custkey")
        .limit(_CMS_TOPK)
    )
    cp = cand.select(
        "o_custkey",
        "exact_cnt",
        F.expr(f"stack({CMS_D}, {stack_args}) AS (i, bucket)"),
    ).select(
        "o_custkey", "exact_cnt", "i", "bucket"
    )
    return (
        cp.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("o_custkey", "exact_cnt")
        .agg(F.min("c").cast("long").alias("cms_estimate"))
        .select(
            "o_custkey",
            "exact_cnt",
            "cms_estimate",
            (F.col("cms_estimate") >= F.col("exact_cnt")).alias(
                "overestimate_ok"
            ),
        )
        .orderBy(F.desc("exact_cnt"), "o_custkey")
    )

"""Bloom-filter semi-join reduction (runtime filter), with telemetry.

The operation every 100 TB join plan wants: when a big fact table
joins a selectively-filtered dimension, build a compact Bloom filter
over the dim keys, ship it to every fact task, and drop non-matching
fact rows BEFORE they reach the shuffle/join. Spark injects this
automatically in some plans (``spark.sql.optimizer.runtime.bloomFilter``);
this operator expresses the same technique explicitly so the filter's
behavior is observable and cross-engine checkable: it surfaces the
prune telemetry (rows passed, exact matches, false positives) that a
production pipeline would monitor to size ``m``.

Reference parity: the reference joins a filtered dimension against
its fact table eagerly (pandas ``merge`` after a boolean mask,
``src/etl.py:87-99``); at its data sizes pruning is irrelevant. At
100 TB the pruning IS the query plan.

Cross-engine contract: the Bloom filter is double hashing over the
registry's public LCG constants — ``pos_i = (h1 + i * h2_odd) mod m``
with h1/h2 two independent LCG passes (Knuth's classic multiplier
pair and Numerical Recipes' — both public constants), h2 forced odd
so the probe stride never degenerates to 0. All arithmetic is exact
64-bit integer math both engines execute identically; the bit array
is 32 bits per BIGINT word so no shift ever touches the sign bit.

Scale design: the dim side collapses to ONE aggregate row (a sorted
list of <= M_WORDS (widx, word) structs) — the standard runtime-filter
artifact, analogous to the subquery result Spark's own injected bloom
broadcasts. The fact probe is pure codegen arithmetic against a
128-literal array (no join, no shuffle) and the exact verification
join broadcasts only the filtered dim keys. No all-pairs stage; the
fact table is scanned twice (once for the total-row count on a single
pruned column, once for probe+join), both map-side.

False-negative guarantee (a Bloom filter never drops a true match) is
pinned by tests/test_runtime_filter.py on planted keys; the
false-positive RATE is data-dependent and surfaced, not asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from workshop3_etl_spark.operators.sketches import HASH_P, hash_sql
from workshop3_etl_spark.plans.registry import register
from workshop3_etl_spark.sources.tables import load_table

# Second independent LCG (Numerical Recipes' public constants); the
# first hash is sketches.hash_sql (glibc's constants).
HASH_A2 = 1_664_525
HASH_B2 = 1_013_904_223

M_BITS = 4_096  # bloom bits (deliberately small: makes fp telemetry visible)
M_WORDS = M_BITS // 32  # 32 payload bits per bigint word: shifts stay positive
N_HASHES = 3

_h1 = hash_sql


def _h2_odd(key: str) -> str:
    # forced odd => stride shares no factor with the power-of-two m
    return f"(2 * (((({key} % {HASH_P}) * {HASH_A2} + {HASH_B2}) % {HASH_P}) % {M_BITS // 2}) + 1)"


def bloom_pos_sql(key: str, i: int) -> str:
    """Bit position of probe ``i`` for ``key`` — engine-neutral SQL,
    used verbatim by the Spark plan and the DuckDB oracle."""
    return f"(({_h1(key)} + {i} * {_h2_odd(key)}) % {M_BITS})"


_DIM_FILTER = "p_brand = 'Brand#19'"
_CENTS = "cast(floor(l_extendedprice * 100e0 + 0.5e0) as bigint)"


def bloom_words(keys: DataFrame, key_col: str) -> list[int]:
    """Build the bloom bit array as ``M_WORDS`` bigint words (32
    payload bits each). One single-row aggregate collect — the
    runtime-filter artifact a production plan broadcasts."""
    pos = keys.select(
        F.explode(
            F.array(*[F.expr(bloom_pos_sql(key_col, i)) for i in range(N_HASHES)])
        ).alias("pos")
    )
    row = (
        pos.select(
            F.expr("pos div 32").alias("widx"),
            F.expr("shiftleft(cast(1 as bigint), pos % 32)").alias("bit"),
        )
        .groupBy("widx")
        .agg(F.expr("bit_or(bit)").alias("word"))
        .agg(F.sort_array(F.collect_list(F.struct("widx", "word"))).alias("ws"))
        .collect()[0]
    )
    words = [0] * M_WORDS
    for e in row["ws"]:
        words[e["widx"]] = e["word"]
    return words


def bloom_member_expr(words: list[int], key_col: str):
    """Membership test: all N_HASHES bits set. Pure codegen integer
    arithmetic over a literal word array — no join, no shuffle, no
    Python. This is the expression a 1000-executor scan evaluates
    per row to drop 99% of the fact stream pre-shuffle."""
    arr = ", ".join(f"cast({w} as bigint)" for w in words)
    checks = []
    for i in range(N_HASHES):
        p = bloom_pos_sql(key_col, i)
        checks.append(
            f"((shiftright(element_at(array({arr}), cast({p} div 32 as int) + 1),"
            f" cast({p} % 32 as int)) & 1) = 1)"
        )
    return F.expr(" AND ".join(checks))


_BLOOM_ORACLE = f"""
WITH keys AS (
  SELECT p_partkey FROM part WHERE {_DIM_FILTER}
),
pos AS (
  SELECT {' UNION ALL SELECT '.join(f'{bloom_pos_sql("p_partkey", i)} AS pos FROM keys' for i in range(N_HASHES))}
),
words AS (
  SELECT pos // 32 AS widx, BIT_OR(CAST(1 AS BIGINT) << (pos % 32)) AS word
  FROM pos GROUP BY 1
),
probe AS (
  SELECT l_partkey, {_CENTS} AS cents,
         {', '.join(f'{bloom_pos_sql("l_partkey", i)} AS p{i}' for i in range(N_HASHES))}
  FROM lineitem
),
passed AS (
  SELECT pr.l_partkey, pr.cents
  FROM probe pr
  {' '.join(f'JOIN words w{i} ON w{i}.widx = pr.p{i} // 32 AND ((w{i}.word >> (pr.p{i} % 32)) & 1) = 1' for i in range(N_HASHES))}
),
flagged AS (
  SELECT p.cents, (k.p_partkey IS NOT NULL) AS hit
  FROM passed p LEFT JOIN keys k ON p.l_partkey = k.p_partkey
),
agg AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS n_bloom_pass,
    CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_match,
    CAST(SUM(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT) AS n_false_positives,
    CAST(SUM(CASE WHEN hit THEN cents ELSE 0 END) AS BIGINT) AS matched_cents_sum
  FROM flagged
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_fact_rows FROM lineitem
),
nd AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_dim_keys FROM keys
)
SELECT nd.n_dim_keys, tot.n_fact_rows, agg.n_bloom_pass,
       agg.n_exact_match, agg.n_false_positives, agg.matched_cents_sum
FROM agg, tot, nd
"""


@register("bloom_semijoin_lineitem_brand", oracle=_BLOOM_ORACLE)
def bloom_semijoin_lineitem_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom runtime filter: prune lineitem by a 4096-bit filter built
    from Brand#19 part keys BEFORE the exact broadcast semi-join, then
    verify exactly and surface prune telemetry (single row).

    The bloom guarantees no false negatives, so
    n_exact_match == the unpruned join's match count — the oracle
    proves the pruned plan lost nothing.
    """
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")

    keys = part.filter(F.expr(_DIM_FILTER)).select("p_partkey")
    words = bloom_words(keys, "p_partkey")

    probe = li.select(
        "l_partkey", F.expr(_CENTS).alias("cents")
    ).filter(bloom_member_expr(words, "l_partkey"))

    flagged = probe.join(
        F.broadcast(keys.withColumnRenamed("p_partkey", "l_partkey").withColumn(
            "hit", F.lit(True)
        )),
        "l_partkey",
        "left",
    ).select("cents", F.coalesce("hit", F.lit(False)).alias("hit"))

    agg = flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_bloom_pass"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).cast("long").alias("n_exact_match"),
        F.sum(F.when(F.col("hit"), 0).otherwise(1))
        .cast("long")
        .alias("n_false_positives"),
        F.sum(F.when(F.col("hit"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("matched_cents_sum"),
    )
    tot = li.agg(F.count(F.lit(1)).cast("long").alias("n_fact_rows"))
    nd = keys.agg(F.count(F.lit(1)).cast("long").alias("n_dim_keys"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nd))
        .select(
            "n_dim_keys",
            "n_fact_rows",
            "n_bloom_pass",
            "n_exact_match",
            "n_false_positives",
            "matched_cents_sum",
        )
    )

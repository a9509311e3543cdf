"""Feature-store operators: point-in-time (PIT) feature assembly and
marketing-style attribution — the label-join layer of a training-data
pipeline.

PIT correctness is THE feature-store invariant: a training example
labeled at time t may only see feature values computed from data
strictly before t (no leakage from the future). The classic
implementation is an as-of join per feature group; Spark-first we
fold every feature group into ONE window pass over the per-entity
event timeline:

- one shuffle on the entity key (user_id), one sort by (ts, id);
- each feature is a frame-bounded aggregate over that ordering
  (running count, RANGE-framed trailing count, carry-forward
  last-observation) — all ending at "-1 row" / "-1 microsecond" so
  the label row itself and anything after it is invisible;
- the label filter happens AFTER feature computation, so features
  see the full prior timeline, labels only survive for purchases.

At 100 TB this is the cheapest possible shape: no per-feature-group
join fan-out (k feature groups = k window expressions sharing one
sort, not k shuffles), no range-join explosion, state bounded per
entity. Skewed entities (bot users) would need the same salting
escape hatch as sessionize — documented there.

Attribution reuses the identical machinery: the "feature" is the
latest preceding touch (non-purchase event), the "label" is purchase
value, and the report aggregates attributed revenue per channel under
last-touch and first-touch models simultaneously.

Reference parity: the reference joins features with pandas merges at
train time (src/etl.py's merge of model inputs); PIT discipline is
this engine's generalization. Tie-break/dedup contract follows
operators/advanced.asof_join (tests/test_asof_api.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from workshop3_etl_spark.functions import metrics as M
from workshop3_etl_spark.plans.registry import register
from workshop3_etl_spark.sources.tables import load_table

_US_7D = 7 * 86_400_000_000  # seven days in microseconds

# ------------------------------------------------------------------
# PIT feature assembly: for every purchase, the features a model
# would be allowed to see at purchase time.
# ------------------------------------------------------------------

_PIT_ORACLE = f"""
WITH t AS (
  SELECT user_id, event_id, event_type, value,
         CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events
),
feat AS (
  SELECT
    user_id, event_id, event_type, value, us,
    COUNT(*) OVER (
      PARTITION BY user_id ORDER BY us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ) AS lifetime_n,
    COUNT(*) OVER (
      PARTITION BY user_id ORDER BY us
      RANGE BETWEEN {_US_7D} PRECEDING AND 1 PRECEDING
    ) AS trailing_7d_n,
    last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
      OVER (
        PARTITION BY user_id ORDER BY us, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      ) AS last_view_value,
    last_value(CASE WHEN event_type = 'view' THEN us END IGNORE NULLS)
      OVER (
        PARTITION BY user_id ORDER BY us, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      ) AS last_view_us
  FROM t
)
SELECT
  user_id,
  event_id AS purchase_event_id,
  us AS purchase_us,
  CAST(lifetime_n AS BIGINT) AS lifetime_n,
  CAST(trailing_7d_n AS BIGINT) AS trailing_7d_n,
  last_view_value,
  us - last_view_us AS view_age_us,
  value AS label_value
FROM feat
WHERE event_type = 'purchase'
ORDER BY user_id, purchase_event_id
"""


@register("pit_features_purchase", oracle=_PIT_ORACLE)
def pit_features_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time training table: per purchase, leakage-free
    features (lifetime activity, trailing-7d activity, latest prior
    view value/age) plus the label, from ONE window pass.

    Every frame ends strictly before the label row (ROWS ... 1
    PRECEDING, RANGE ... 1 [microsecond] PRECEDING), which is the PIT
    guarantee. The RANGE frame orders by the integer microsecond key
    so boundary semantics are bit-identical across engines.
    """
    t = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("us"),
    )
    w_rows = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_range = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_US_7D, -1)
    )
    view_value = F.when(F.col("event_type") == "view", F.col("value"))
    view_us = F.when(F.col("event_type") == "view", F.col("us"))
    feat = t.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        "us",
        F.count(F.lit(1)).over(w_rows).cast("long").alias("lifetime_n"),
        F.count(F.lit(1)).over(w_range).cast("long").alias("trailing_7d_n"),
        F.last(view_value, ignorenulls=True).over(w_rows).alias("last_view_value"),
        F.last(view_us, ignorenulls=True).over(w_rows).alias("last_view_us"),
    )
    return (
        feat.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_event_id"),
            F.col("us").alias("purchase_us"),
            "lifetime_n",
            "trailing_7d_n",
            "last_view_value",
            (F.col("us") - F.col("last_view_us")).alias("view_age_us"),
            F.col("value").alias("label_value"),
        )
        .orderBy("user_id", "purchase_event_id")
    )


# ------------------------------------------------------------------
# Revenue attribution: purchase value credited to the preceding touch
# under last-touch (within a 7-day lookback; else 'direct') and
# first-touch (first touch ever; else 'direct') models, reported per
# channel side by side.
# ------------------------------------------------------------------

_ATTR_ORACLE = f"""
WITH t AS (
  SELECT user_id, event_id, event_type, value,
         CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events
),
touched AS (
  SELECT
    user_id, event_id, event_type, value, us,
    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ) AS lt_channel,
    last_value(CASE WHEN event_type <> 'purchase' THEN us END
               IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ) AS lt_us,
    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ) AS ft_channel
  FROM t
),
p AS (
  SELECT
    CASE WHEN lt_channel IS NULL OR us - lt_us > {_US_7D}
         THEN 'direct' ELSE lt_channel END AS last_touch,
    CASE WHEN ft_channel IS NULL THEN 'direct' ELSE ft_channel END
      AS first_touch,
    value
  FROM touched WHERE event_type = 'purchase'
),
lt AS (
  SELECT last_touch AS channel,
         CAST(COUNT(*) AS BIGINT) AS n_last,
         {M.oracle_dsum('value', 'revenue_last')}
  FROM p GROUP BY last_touch
),
ft AS (
  SELECT first_touch AS channel,
         CAST(COUNT(*) AS BIGINT) AS n_first,
         {M.oracle_dsum('value', 'revenue_first')}
  FROM p GROUP BY first_touch
)
SELECT
  COALESCE(lt.channel, ft.channel) AS channel,
  COALESCE(lt.n_last, CAST(0 AS BIGINT)) AS n_last,
  COALESCE(lt.revenue_last, 0.0) AS revenue_last,
  COALESCE(ft.n_first, CAST(0 AS BIGINT)) AS n_first,
  COALESCE(ft.revenue_first, 0.0) AS revenue_first
FROM lt FULL OUTER JOIN ft ON lt.channel = ft.channel
ORDER BY channel
"""


@register("attribution_touch_revenue", oracle=_ATTR_ORACLE)
def attribution_touch_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch (7-day lookback, else 'direct') and first-touch
    purchase-revenue attribution per channel, one row per channel.

    Same single window pass as the PIT table (the touch channel IS a
    PIT feature); the two attribution models then aggregate the tiny
    purchase frame twice and full-outer-join per channel — both aggs
    reuse one shuffled intermediate, never the raw events.
    """
    t = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_ch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    touch_us = F.when(F.col("event_type") != "purchase", F.col("us"))
    touched = t.select(
        "event_type",
        "value",
        "us",
        F.last(touch_ch, ignorenulls=True).over(w).alias("lt_channel"),
        F.last(touch_us, ignorenulls=True).over(w).alias("lt_us"),
        F.first(touch_ch, ignorenulls=True).over(w).alias("ft_channel"),
    )
    p = (
        touched.filter(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("lt_channel").isNull()
                | ((F.col("us") - F.col("lt_us")) > _US_7D),
                F.lit("direct"),
            )
            .otherwise(F.col("lt_channel"))
            .alias("last_touch"),
            F.coalesce(F.col("ft_channel"), F.lit("direct")).alias("first_touch"),
            "value",
        )
        .persist()
    )
    lt = p.groupBy(F.col("last_touch").alias("channel")).agg(
        F.count(F.lit(1)).alias("n_last"), M.dsum("value", "revenue_last")
    )
    ft = p.groupBy(F.col("first_touch").alias("channel")).agg(
        F.count(F.lit(1)).alias("n_first"), M.dsum("value", "revenue_first")
    )
    result = (
        lt.join(ft, "channel", "full_outer")
        .select(
            "channel",
            F.coalesce(F.col("n_last"), F.lit(0).cast("long")).alias("n_last"),
            F.coalesce(F.col("revenue_last"), F.lit(0.0)).alias("revenue_last"),
            F.coalesce(F.col("n_first"), F.lit(0).cast("long")).alias("n_first"),
            F.coalesce(F.col("revenue_first"), F.lit(0.0)).alias("revenue_first"),
        )
        .orderBy("channel")
    )
    from workshop3_etl_spark.functions.cache import materialize_and_release

    return materialize_and_release(result, p)


# ------------------------------------------------------------------
# RFM segmentation: quartile scores on recency / frequency / monetary
# per customer, composed into a segment label. Boundaries use exact
# percentile() (bit-identical to DuckDB quantile_cont — the A8
# contract) at dyadic-exact probabilities .25/.5/.75.
# ------------------------------------------------------------------

_RFM_ORACLE = """
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS d FROM orders),
cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                        (SELECT d FROM mx)) AS BIGINT) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(o_totalprice AS decimal(27,2))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
),
b AS (
  SELECT
    quantile_cont(CAST(recency_days AS DOUBLE), 0.25) AS r25,
    quantile_cont(CAST(recency_days AS DOUBLE), 0.5) AS r50,
    quantile_cont(CAST(recency_days AS DOUBLE), 0.75) AS r75,
    quantile_cont(CAST(frequency AS DOUBLE), 0.25) AS f25,
    quantile_cont(CAST(frequency AS DOUBLE), 0.5) AS f50,
    quantile_cont(CAST(frequency AS DOUBLE), 0.75) AS f75,
    quantile_cont(monetary, 0.25) AS m25,
    quantile_cont(monetary, 0.5) AS m50,
    quantile_cont(monetary, 0.75) AS m75
  FROM cust
),
scored AS (
  SELECT
    4 - (CAST(CAST(recency_days AS DOUBLE) > b.r25 AS INT)
         + CAST(CAST(recency_days AS DOUBLE) > b.r50 AS INT)
         + CAST(CAST(recency_days AS DOUBLE) > b.r75 AS INT)) AS r_score,
    1 + CAST(CAST(frequency AS DOUBLE) > b.f25 AS INT)
      + CAST(CAST(frequency AS DOUBLE) > b.f50 AS INT)
      + CAST(CAST(frequency AS DOUBLE) > b.f75 AS INT) AS f_score,
    1 + CAST(monetary > b.m25 AS INT)
      + CAST(monetary > b.m50 AS INT)
      + CAST(monetary > b.m75 AS INT) AS m_score,
    monetary
  FROM cust CROSS JOIN b
)
SELECT
  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
    || CAST(m_score AS VARCHAR) AS segment,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(SUM(CAST(monetary AS decimal(27,2))) AS DOUBLE) AS total_monetary
FROM scored
GROUP BY 1
ORDER BY segment
"""


@register("rfm_customer_segments", oracle=_RFM_ORACLE)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) quartile segmentation of
    customers by order history, reported as segment label ->
    customer count and total spend.

    One groupBy collapses orders to per-customer metrics; quartile
    boundaries are ONE exact-percentile aggregate over that (much
    smaller) frame, broadcast back; scoring is map-only comparisons.
    At 100 TB the exact percentile swaps for percentile_approx —
    the documented A8 trade — with everything else unchanged.
    """
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("d"))
    cust = (
        orders.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.first("d"), F.max(F.col("o_orderdate").cast("date"))
            )
            .cast("long")
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
            .cast("double")
            .alias("monetary"),
        )
        .persist()
    )
    b = cust.agg(
        F.expr("percentile(cast(recency_days as double), 0.25)").alias("r25"),
        F.expr("percentile(cast(recency_days as double), 0.5)").alias("r50"),
        F.expr("percentile(cast(recency_days as double), 0.75)").alias("r75"),
        F.expr("percentile(cast(frequency as double), 0.25)").alias("f25"),
        F.expr("percentile(cast(frequency as double), 0.5)").alias("f50"),
        F.expr("percentile(cast(frequency as double), 0.75)").alias("f75"),
        F.expr("percentile(monetary, 0.25)").alias("m25"),
        F.expr("percentile(monetary, 0.5)").alias("m50"),
        F.expr("percentile(monetary, 0.75)").alias("m75"),
    )

    def score_up(col: str, lo: str, mid: str, hi: str) -> F.Column:
        c = F.col(col).cast("double")
        return (
            F.lit(1)
            + (c > F.col(lo)).cast("int")
            + (c > F.col(mid)).cast("int")
            + (c > F.col(hi)).cast("int")
        )

    scored = cust.crossJoin(F.broadcast(b)).select(
        (F.lit(4) - (score_up("recency_days", "r25", "r50", "r75") - 1)).alias(
            "r_score"
        ),
        score_up("frequency", "f25", "f50", "f75").alias("f_score"),
        score_up("monetary", "m25", "m50", "m75").alias("m_score"),
        "monetary",
    )
    result = (
        scored.groupBy(
            F.concat(
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ).alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("monetary").cast("decimal(27,2)"))
            .cast("double")
            .alias("total_monetary"),
        )
        .orderBy("segment")
    )
    from workshop3_etl_spark.functions.cache import materialize_and_release

    return materialize_and_release(result, cust)


# --------------------------------------------------------------------
# Time-decay attribution: every touchpoint in the 7 days before a
# purchase earns credit value * 2^-k (k = whole days back) — the
# decay-weighted sibling of the first/last-touch models above. The
# weights are dyadic (2^-k, k <= 6), so in 1/64-weight x cents units
# every sum is an INTEGER: exact, commutative, bit-identical across
# engines — no float accumulation anywhere.
# --------------------------------------------------------------------

_US_1D = 86_400_000_000

_DECAY_ORACLE = f"""
WITH tch AS (
  SELECT user_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events WHERE event_type <> 'purchase'
),
p AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us,
         cast(floor(value * 100e0 + 0.5e0) as bigint) AS cents
  FROM events WHERE event_type = 'purchase'
),
pr AS (
  SELECT tch.event_type AS channel,
         (p.us - tch.us) // {_US_1D} AS k,
         p.cents
  FROM p JOIN tch ON tch.user_id = p.user_id
   AND tch.us < p.us AND p.us - tch.us < {_US_7D}
)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_touch_pairs,
       CAST(SUM(CAST(1 AS BIGINT) << (6 - k)) AS DOUBLE) / 64.0
         AS weight_sum,
       CAST(SUM(CAST(cents AS decimal(38,0)) * (CAST(1 AS BIGINT) << (6 - k)))
            AS DOUBLE) / 6400.0 AS revenue_decay
FROM pr
GROUP BY channel
ORDER BY channel
"""


@register("attribution_time_decay_revenue", oracle=_DECAY_ORACLE)
def attribution_time_decay_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Decay-weighted (2^-days, 7-day lookback) purchase-revenue
    credit per channel: touchpoint count, total decay weight, and
    decay-weighted revenue.

    The purchase×touch pairing is one shuffle-on-user_id join with the
    time predicates applied post-join — per-user pair cost is bounded
    by session length, the same locality as the PIT window queries.
    All arithmetic stays integer until the final surfaced division:
    weights as 2^(6-k) (shiftleft), revenue as cents x weight in
    decimal(38,0) — sums are exact hence order-independent, so the
    result is bit-identical under ANY partitioning. (This is the
    unnormalized decay model: credit is value x 2^-k per touch; the
    per-conversion-normalized variant divides by an arbitrary integer
    and cannot stay exact.)
    """
    ev = load_table(spark, sf_dir, "events")
    tch = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.unix_micros("ts").alias("t_us"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("p_us"),
        F.expr("cast(floor(value * 100e0 + 0.5e0) as bigint)").alias(
            "cents"
        ),
    )
    pr = (
        p.join(tch, "user_id")
        .filter(
            (F.col("t_us") < F.col("p_us"))
            & (F.col("p_us") - F.col("t_us") < F.lit(_US_7D))
        )
        .select(
            "channel",
            F.expr(f"shiftleft(cast(1 as bigint), "
                   f"cast(6 - (p_us - t_us) div {_US_1D} as int))")
            .alias("w64"),
            "cents",
        )
    )
    return (
        pr.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touch_pairs"),
            (F.sum("w64").cast("double") / F.lit(64.0)).alias("weight_sum"),
            (
                F.sum(F.col("cents").cast("decimal(38,0)") * F.col("w64"))
                .cast("double")
                / F.lit(6400.0)
            ).alias("revenue_decay"),
        )
        .orderBy("channel")
    )

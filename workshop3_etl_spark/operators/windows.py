"""Window-function operators.

The reference has no OVER clauses (SURVEY §2.6) — these are the §7
build-plan extensions that give the engine the windowed-analytics
surface any warehouse user expects, expressed with Spark's Window API.

Scale notes:
- Every window here is PARTITIONED (by supplier/customer/user) — an
  unpartitioned window collapses to one task and is forbidden in this
  codebase (SURVEY §2.6 flag); global aggregates use agg+broadcast
  instead (see relational.scalar_subquery_above_avg).
- Ordering keys always end with a unique tie-breaker so results are
  deterministic under any partitioning.
- Running sums cast to exact decimals at the frame boundary — same
  determinism rules as functions/metrics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from workshop3_etl_spark.plans.registry import register
from workshop3_etl_spark.sources.tables import load_table


# --------------------------------------------------------------------
# Top-N per group (the distributed form of the reference's global
# top-k T1 — `Reporte_Tecnico.md:529-538` — partitioned so it scales).
# --------------------------------------------------------------------

_TOP3_ORACLE = """
SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice
FROM (
  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY l_suppkey
           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
         ) AS INT) AS rn
  FROM lineitem
) t
WHERE rn <= 3
ORDER BY l_suppkey, rn
"""


@register("window_top3_per_supplier", oracle=_TOP3_ORACLE)
def window_top3_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier top-3 lineitems by price via row_number."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .select("l_suppkey", "rn", "l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_suppkey", "rn")
    )


# --------------------------------------------------------------------
# Running (cumulative) aggregate per key.
# --------------------------------------------------------------------

_RUNNING_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  o_orderdate,
  CAST(SUM(CAST(o_totalprice AS decimal(27,2))) OVER (
    PARTITION BY o_custkey
    ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS running_spend
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


@register("window_running_customer_spend", oracle=_RUNNING_ORACLE)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative customer spend ordered by order date."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
            .over(w)
            .cast("double")
            .alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


# --------------------------------------------------------------------
# lag/lead deltas on the event stream (batch form; the streaming
# stateful form lives in streaming/).
# --------------------------------------------------------------------

_LAG_ORACLE = """
SELECT
  user_id,
  event_id,
  ts,
  value,
  LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
  value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
FROM events
ORDER BY user_id, ts, event_id
"""


@register("window_lag_delta_events", oracle=_LAG_ORACLE)
def window_lag_delta_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-over-event value delta via lag."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            prev.alias("prev_value"),
            (F.col("value") - prev).alias("delta"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


# --------------------------------------------------------------------
# Ranking family: dense_rank + ntile within broadcastable dims.
# --------------------------------------------------------------------

_RANK_ORACLE = """
SELECT
  s_nationkey,
  s_suppkey,
  s_acctbal,
  CAST(DENSE_RANK() OVER (
    PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
  ) AS INT) AS balance_rank,
  CAST(NTILE(4) OVER (
    PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
  ) AS INT) AS quartile
FROM supplier
ORDER BY s_nationkey, balance_rank, s_suppkey
"""


@register("window_rank_supplier_balance", oracle=_RANK_ORACLE)
def window_rank_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank + ntile of suppliers by balance within nation."""
    supp = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        supp.select(
            "s_nationkey",
            "s_suppkey",
            "s_acctbal",
            F.dense_rank().over(w).alias("balance_rank"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("s_nationkey", "balance_rank", "s_suppkey")
    )


# --------------------------------------------------------------------
# Share-of-total per key (windowed ratio — the partitioned form of
# the reference's scalar-subquery R² denominator, J2/A4).
# --------------------------------------------------------------------

_SHARE_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  o_totalprice,
  CAST(o_totalprice AS DOUBLE) / CAST(SUM(CAST(o_totalprice AS decimal(27,2))) OVER (
    PARTITION BY o_custkey
  ) AS DOUBLE) AS share_of_customer
FROM orders
ORDER BY o_custkey, o_orderkey
"""


@register("window_share_of_customer", oracle=_SHARE_ORACLE)
def window_share_of_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each order's share of its customer's total spend."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    total = F.sum(F.col("o_totalprice").cast("decimal(27,2)")).over(w).cast("double")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            (F.col("o_totalprice").cast("double") / total).alias("share_of_customer"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------
# Gap-based sessionization (lag + cumulative flag — the batch twin of
# streaming session windows; §2.9 notes the reference has no session
# semantics at all, this is the idiomatic-Spark extension).
# --------------------------------------------------------------------

_SESSION_ORACLE = """
WITH flagged AS (
  SELECT
    user_id,
    event_id,
    ts,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) > 1800000000
         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
    THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT
    user_id,
    event_id,
    ts,
    SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_id
  FROM flagged
)
SELECT
  user_id,
  CAST(session_id AS BIGINT) AS session_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(MIN(epoch_us(ts)) AS BIGINT) AS session_start_us,
  CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS duration_us
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


@register("sessionize_events_30min", oracle=_SESSION_ORACLE)
def sessionize_events_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30-min inactivity) per user.

    lag→flag→cumsum is one shuffle on user_id reused by all three
    window passes (same partitioning), then the session aggregate is
    map-side combinable — the classic scalable sessionization plan.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us).over(w)
    new_session = (
        F.when(prev_us.isNull() | ((us - prev_us) > 1_800_000_000), 1).otherwise(0)
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.select("user_id", "event_id", "ts", new_session.alias("new_session"))
        .select(
            "user_id",
            "event_id",
            "ts",
            F.sum("new_session").over(cum).alias("session_id"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_micros(F.col("ts"))).alias("session_start_us"),
            (F.max(F.unix_micros(F.col("ts"))) - F.min(F.unix_micros(F.col("ts"))))
            .alias("duration_us"),
        )
        .orderBy("user_id", "session_id")
    )


# --------------------------------------------------------------------
# Cohort / retention: users grouped by first-activity day, tracked
# across subsequent days — the canonical product-analytics rollup
# (first-touch attribution + activity join).
# --------------------------------------------------------------------

_COHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT
  cohort_day,
  CAST(day_offset AS INT) AS day_offset,
  CAST(COUNT(*) AS BIGINT) AS n_active_users
FROM activity
WHERE day_offset <= 7
GROUP BY cohort_day, day_offset
ORDER BY cohort_day, day_offset
"""


@register("cohort_retention_daily", oracle=_COHORT_ORACLE)
def cohort_retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention (first 7 days): min-ts cohort assignment
    broadcast back onto the activity stream, distinct-active-days per
    user, counts per (cohort, offset). Two small shuffles — both on
    user_id, so AQE reuses the partitioning."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    activity = (
        ev.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day"))
            .alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .orderBy("cohort_day", "day_offset")
    )


# --------------------------------------------------------------------
# Time-RANGE frame: trailing 7-day per-user aggregates. The frame key
# is integer epoch-microseconds in BOTH engines, so boundary
# semantics are bit-identical (a timestamp-typed RANGE INTERVAL frame
# would hide each engine's timestamp arithmetic in the comparison).
# --------------------------------------------------------------------

_7D_US = 7 * 86_400 * 1_000_000

_TRAILING_ORACLE = f"""
SELECT
  user_id,
  event_id,
  ts,
  CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
  CAST(SUM(CAST(value AS decimal(27,2))) OVER w AS DOUBLE) AS sum_7d
FROM events
WINDOW w AS (
  PARTITION BY user_id
  ORDER BY epoch_us(ts)
  RANGE BETWEEN {_7D_US} PRECEDING AND CURRENT ROW
)
ORDER BY user_id, ts, event_id
"""


@register("window_trailing_7d_user_value", oracle=_TRAILING_ORACLE)
def window_trailing_7d_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing 7-day count and value sum for the event's
    user (RANGE frame over epoch-microseconds).

    RANGE frames include every row with an equal ordering key, so the
    result is deterministic even when a user has simultaneous events
    — no tie-breaker needed inside the frame, unlike ROWS frames.
    Scale: partitioned by user_id; one shuffle, sort within
    partitions, single pass with a sliding frame.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-_7D_US, 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            F.count(F.lit(1)).over(w).alias("n_7d"),
            F.sum(F.col("value").cast("decimal(27,2)"))
            .over(w)
            .cast("double")
            .alias("sum_7d"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


# --------------------------------------------------------------------
# Ordered funnel conversion: view -> click -> purchase, each stage
# anchored at the earliest qualifying event of the previous stage —
# the product-analytics funnel the cohort query doesn't cover.
# --------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH per_user AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
  FROM events GROUP BY user_id
),
clicks AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN per_user p ON e.user_id = p.user_id
  WHERE e.event_type = 'click' AND p.t_view IS NOT NULL
    AND e.ts >= p.t_view AND e.ts <= p.t_view + INTERVAL 1 DAY
  GROUP BY e.user_id
),
purchases AS (
  SELECT e.user_id
  FROM events e JOIN clicks c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts >= c.t_click AND e.ts <= c.t_click + INTERVAL 1 DAY
  GROUP BY e.user_id
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM per_user) AS n_users,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM per_user WHERE t_view IS NOT NULL)
    AS n_viewed,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM clicks) AS n_clicked_after_view,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM purchases)
    AS n_purchased_after_click
"""


@register("funnel_view_click_purchase", oracle=_FUNNEL_ORACLE)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage counts for the view -> click -> purchase funnel: clicks
    count only within ONE DAY at-or-after the user's FIRST view;
    purchases only within one day at-or-after the first qualifying
    click. The day bounds are what make the stages (and therefore
    the oracle check) discriminating — with month-long event streams
    an unbounded 'ever after' funnel converts every user, and a
    broken ordering predicate would be invisible.

    Scale notes: three aggregates keyed by user_id plus two
    user_id-equi-joins — every stage frame is one row per user, all
    exchanges share the user_id key so AQE co-partitions the chain;
    no window buffers, no event-level self-join.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    day = F.expr("INTERVAL 1 DAY")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(per_user.filter(F.col("t_view").isNotNull()), "user_id")
        .filter(
            (F.col("ts") >= F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + day)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(
            (F.col("ts") >= F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + day)
        )
        .select("user_id")
        .distinct()
    )
    return (
        per_user.agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.col("t_view").isNotNull().cast("int")).cast("long")
            .alias("n_viewed"),
        )
        .crossJoin(
            clicks.agg(F.count(F.lit(1)).alias("n_clicked_after_view"))
        )
        .crossJoin(
            purchases.agg(
                F.count(F.lit(1)).alias("n_purchased_after_click")
            )
        )
    )


# --------------------------------------------------------------------
# Argmax aggregate: latest event per user via max_by/arg_max — top-1
# WITHOUT a window (one map-side-combinable aggregate instead of a
# sort + row_number buffer; the scale-preferred top-1 form).
# --------------------------------------------------------------------

# Zero-padded sortable key: identical strings in both engines make
# max_by/arg_max deterministic (epoch-micros alone can tie; event_id
# breaks the tie inside the key itself).
_ORD_KEY_SPARK = (
    "concat(lpad(cast(unix_micros(ts) as string), 20, '0'),"
    " lpad(cast(event_id as string), 12, '0'))"
)
_ORD_KEY_DUCK = (
    "lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')"
    " || lpad(CAST(event_id AS VARCHAR), 12, '0')"
)

_LATEST_ORACLE = f"""
SELECT
  user_id,
  arg_max(event_type, {_ORD_KEY_DUCK}) AS last_event_type,
  arg_max(CAST(value AS DOUBLE), {_ORD_KEY_DUCK}) AS last_value,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@register("latest_event_per_user", oracle=_LATEST_ORACLE)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's most recent event (type + value) as ONE argmax
    aggregate — no sort, no window buffer; partial max_by combines
    map-side, so the exchange carries one candidate row per
    (partition, user).

    NULL parity: DuckDB's arg_max SKIPS rows whose argument is NULL
    (returns the latest non-NULL one) while Spark's max_by would
    return the NULL at the max key — so each argmax nulls its
    ordering key when its own argument is NULL, reproducing the
    skip-null semantics exactly (empirically verified; the events
    schema is nullable even though current fixtures carry no nulls).
    """
    ev = load_table(spark, sf_dir, "events")
    key = F.expr(_ORD_KEY_SPARK)
    val = F.col("value").cast("double")
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by(
                F.col("event_type"),
                F.when(F.col("event_type").isNotNull(), key),
            ).alias("last_event_type"),
            F.max_by(val, F.when(val.isNotNull(), key)).alias("last_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------
# Ordered list aggregation: per-user event-type journey string —
# deterministic collect via sortable struct keys (Spark) == ordered
# string_agg (DuckDB).
# --------------------------------------------------------------------

_JOURNEY_ORACLE = f"""
SELECT
  user_id,
  string_agg(event_type, ',' ORDER BY {_ORD_KEY_DUCK}) AS journey,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@register("journey_events_per_user", oracle=_JOURNEY_ORACLE)
def journey_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered event-type journey (comma-joined), built as
    collect_list of (key, type) structs -> array_sort -> transform ->
    concat — the deterministic ordered-list-agg idiom (collect_list
    alone has no ordering guarantee under distributed execution).

    Scale notes: per-user journeys assume bounded per-key cardinality
    (session/user journeys, not the whole fact table); the aggregate
    is one shuffle keyed by user, and ordering happens inside the
    finished array, not via a global sort.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.expr(
                f"concat_ws(',', transform(array_sort(collect_list("
                f"struct({_ORD_KEY_SPARK} as k, event_type as t))),"
                f" s -> s.t))"
            ).alias("journey"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------
# Distribution-rank analytics: ntile / percent_rank / cume_dist over
# per-customer spend. Completes the analytic-function surface next to
# row_number/rank/lag/lead/frames covered above.
# --------------------------------------------------------------------

_DECILE_ORACLE = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS decimal(27,2))) AS DOUBLE)
           AS total_spend
  FROM orders
  GROUP BY o_custkey
)
SELECT
  o_custkey,
  total_spend,
  CAST(NTILE(10) OVER w AS INT) AS decile,
  PERCENT_RANK() OVER w AS pct_rank,
  CUME_DIST() OVER w AS cume_dist
FROM spend
WINDOW w AS (ORDER BY total_spend DESC, o_custkey)
ORDER BY total_spend DESC, o_custkey
LIMIT 300
"""


@register("window_spend_deciles", oracle=_DECILE_ORACLE)
def window_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend deciles with percent_rank and cume_dist —
    WITHOUT the single-partition global window a naive
    ``Window.orderBy`` compiles to.

    Distributed exact global rank via bucket offsets: rows bucket by
    a spend range; per-bucket ranks come from a PARTITIONED window;
    the only unpartitioned window runs over the bucket-count spine —
    a dimension-tiny aggregate (thousands of rows at any SF), i.e.
    the reduced side this module's header demands. global_rank =
    bucket offset + in-bucket rank. Under the unique
    (spend desc, custkey) ordering: percent_rank = (rn-1)/(n-1),
    cume_dist = rn/n, and NTILE follows its first-(n%b)-tiles-larger
    contract — all reproduced as explicit integer/double arithmetic,
    bit-identical to the oracle's native window functions.
    """
    from workshop3_etl_spark.functions.cache import materialize_and_release

    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
            .cast("double")
            .alias("total_spend")
        )
        .withColumn("bucket", F.floor(F.col("total_spend") / F.lit(50_000.0)))
        # referenced three times below (offsets spine, rank join, n);
        # persist so orders is scanned ONCE, released before return
        .persist()
    )
    # tiny spine: rows per bucket -> exclusive offset in DESC order
    wb = (
        Window.orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        spend.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("bn"))
        .select(
            "bucket",
            F.coalesce(F.sum("bn").over(wb), F.lit(0)).alias("off"),
        )
    )
    wr = Window.partitionBy("bucket").orderBy(
        F.desc("total_spend"), F.asc("o_custkey")
    )
    ranked = (
        spend.join(F.broadcast(offsets), "bucket")
        .select(
            "o_custkey",
            "total_spend",
            (F.row_number().over(wr) + F.col("off")).alias("rn"),
        )
    )
    n_row = spend.agg(F.count(F.lit(1)).alias("n"))
    rn = F.col("rn")
    n = F.col("n")
    q = (n / 10).cast("long")  # ANSI: integer div via cast
    r = n % 10
    cut = r * (q + 1)
    ntile = F.when(rn <= cut, ((rn - 1) / (q + 1)).cast("long") + 1).otherwise(
        r + ((rn - cut - 1) / q).cast("long") + 1
    )
    result = (
        ranked.crossJoin(F.broadcast(n_row))
        .select(
            "o_custkey",
            "total_spend",
            ntile.cast("int").alias("decile"),
            (
                (rn - 1).cast("double") / (n - 1).cast("double")
            ).alias("pct_rank"),
            (rn.cast("double") / n.cast("double")).alias("cume_dist"),
        )
        .orderBy(F.desc("total_spend"), F.asc("o_custkey"))
        .limit(300)
    )
    return materialize_and_release(result, spend)


# --------------------------------------------------------------------
# Gaps-and-islands: longest consecutive-active-day streak per user.
# The island key is day_index - row_number — constant within a
# consecutive run, strictly decreasing across gaps.
# --------------------------------------------------------------------

_STREAK_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
g AS (
  SELECT user_id, d,
         date_diff('day', DATE '2024-01-01', d)
           - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
  FROM d
),
s AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS streak_days
  FROM g GROUP BY user_id, grp
)
SELECT
  user_id,
  CAST(MAX(streak_days) AS BIGINT) AS longest_streak_days,
  CAST(COUNT(*) AS BIGINT) AS n_streaks,
  CAST(SUM(streak_days) AS BIGINT) AS total_active_days
FROM s
GROUP BY user_id
ORDER BY user_id
"""


@register("streaks_user_active_days", oracle=_STREAK_ORACLE)
def streaks_user_active_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive active days per user
    (gaps-and-islands via the day_index - row_number island key; all
    windows partitioned by user)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    wk = Window.partitionBy("user_id").orderBy("d")
    g = d.select(
        "user_id",
        "d",
        (
            F.datediff(F.col("d"), F.lit("2024-01-01").cast("date"))
            - F.row_number().over(wk)
        ).alias("grp"),
    )
    s = g.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_days")
    )
    return (
        s.groupBy("user_id")
        .agg(
            F.max("streak_days").cast("long").alias("longest_streak_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.sum("streak_days").cast("long").alias("total_active_days"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------
# SCD Type-2 history build: collapse the per-user event stream into
# validity intervals of the (changing) event_type attribute — the
# standard dimension-history shape (valid_from / valid_to / is_current).
# --------------------------------------------------------------------

_SCD2_ORACLE = """
WITH c AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
ch AS (
  SELECT user_id, ts, event_id, event_type
  FROM c
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT
  user_id,
  event_type,
  ts AS valid_from,
  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
  CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       AS BOOLEAN) AS is_current
FROM ch
ORDER BY user_id, valid_from, event_id
LIMIT 2000
"""


@register("scd2_user_type_history", oracle=_SCD2_ORACLE)
def scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 validity intervals for each user's event_type
    attribute: change rows detected via lag, intervals closed via
    lead, open-ended rows flagged current. One shuffle on user_id;
    both window passes share the partitioning."""
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lag("event_type").over(wo).alias("prev_type"),
    )
    ch = c.filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    return (
        ch.select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(wo).alias("valid_to"),
            F.lead("ts").over(wo).isNull().alias("is_current"),
            "event_id",
        )
        .orderBy("user_id", "valid_from", "event_id")
        .limit(2000)
        .drop("event_id")
    )


# --------------------------------------------------------------------
# DAU/WAU stickiness: daily actives over trailing-7-day actives. The
# trailing distinct is computed by fanning each (user, day) out to the
# 7 report days it supports — map-only explode on the ALREADY-DEDUPED
# user-day frame, then one distinct count per report day. No range
# join, no per-day re-scan of raw events.
# --------------------------------------------------------------------

_STICKINESS_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events
),
mx AS (SELECT MAX(d) AS md FROM ud),
dau AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d
),
fan AS (
  SELECT user_id,
         CAST(unnest(generate_series(d, d + INTERVAL 6 DAY,
                                     INTERVAL 1 DAY)) AS DATE) AS rd
  FROM ud
),
wau AS (
  SELECT rd AS d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM fan CROSS JOIN mx
  WHERE rd <= mx.md
  GROUP BY rd
)
SELECT
  dau.d AS day,
  dau.dau AS dau,
  wau.wau AS wau,
  CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
FROM dau JOIN wau ON dau.d = wau.d
ORDER BY day
"""


@register("stickiness_dau_wau_daily", oracle=_STICKINESS_ORACLE)
def stickiness_dau_wau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU, trailing-7-day WAU and the DAU/WAU stickiness ratio per
    day.

    The user-day dedup happens FIRST (one shuffle collapses the raw
    events); the 7x fan-out rides that small frame, so the cost at
    100 TB is O(active user-days), not O(events). The trailing
    distinct needs no windowed COUNT(DISTINCT) (which no engine
    supports) — membership fan-out + plain distinct count is the
    equivalent distributed form.
    """
    ud = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
        )
        .distinct()
        .persist()
    )
    mx = ud.agg(F.max("d").alias("md"))
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    fan = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), 6), F.expr("INTERVAL 1 DAY")
            )
        ).alias("rd"),
    )
    wau = (
        fan.crossJoin(F.broadcast(mx))
        .filter(F.col("rd") <= F.col("md"))
        .groupBy(F.col("rd").alias("d"))
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )
    result = (
        dau.join(wau, "d")
        .select(
            F.col("d").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )
    from workshop3_etl_spark.functions.cache import materialize_and_release

    return materialize_and_release(result, ud)


# --------------------------------------------------------------------
# CDC changelog apply: collapse an upsert/delete change feed into the
# latest-wins snapshot — the SCD Type-1 / Delta-CDF "apply changes"
# shape that complements the SCD2 history build above. The events
# stream doubles as the feed: 'error' events are tombstones, every
# other event upserts the user's (type, value) profile row.
# --------------------------------------------------------------------

_CDC_ORACLE = """
WITH ch AS (
  SELECT user_id, ts, event_id, value, event_type,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert'
         END AS op
  FROM events
),
r AS (
  SELECT user_id, ts, event_id, value, event_type, op,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM ch
)
SELECT user_id,
       event_type AS last_type,
       value AS last_value,
       ts AS last_ts
FROM r
WHERE rn = 1 AND op = 'upsert'
ORDER BY user_id
"""


@register("cdc_apply_latest_snapshot", oracle=_CDC_ORACLE)
def cdc_apply_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins CDC apply: reduce the per-user change feed to one
    row per key, honoring delete tombstones ('error' events remove the
    row entirely).

    One shuffle on the merge key (user_id) ranks changes by
    (ts, event_id) descending; rn = 1 picks the winning change and the
    tombstone filter happens AFTER ranking — a delete newer than every
    upsert deletes the key, an older one is superseded. This
    rank-then-filter plan is exactly the dedup-before-MERGE stage a
    lakehouse CDC pipeline runs before `MERGE INTO` (see
    sources/lakehouse.staged_merge_batch for the sink leg); at 100 TB
    it's one hash exchange of the change feed, no driver state.
    Reference parity: kafka/consumer.py applies Kafka upserts row-wise
    via ON CONFLICT; this is the set-based batch equivalent.
    """
    ev = load_table(spark, sf_dir, "events")
    ch = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        "event_type",
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ch.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") == "upsert"))
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------
# Cumulative distinct users: running count of users ever seen, by day.
# A windowed COUNT(DISTINCT) doesn't exist in any engine and a naive
# per-day re-scan is quadratic; the distributed form is first-
# occurrence collapse (one groupBy user) + a running sum over the
# day spine.
# --------------------------------------------------------------------

_CUMULATIVE_USERS_ORACLE = """
WITH ud AS (
  SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_d
  FROM events GROUP BY user_id
),
daily AS (
  SELECT first_d AS d, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM ud GROUP BY first_d
),
spine AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d FROM events
)
SELECT s.d AS day,
       COALESCE(n.new_users, 0) AS new_users,
       CAST(SUM(COALESCE(n.new_users, 0)) OVER (
         ORDER BY s.d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cumulative_users
FROM spine s LEFT JOIN daily n ON s.d = n.d
ORDER BY day
"""


@register("window_cumulative_distinct_users", oracle=_CUMULATIVE_USERS_ORACLE)
def window_cumulative_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-day new-user count and the running total of distinct users
    ever seen.

    The expensive part — "has this user appeared before?" — is ONE
    groupBy(user_id).min(day) over the raw events (map-side
    combinable); everything after rides the day spine, whose
    cardinality is calendar-bounded and does NOT grow with data
    volume, so the unpartitioned running-sum window is safe at any
    scale (same justification as the sketches.py rolling-KMV spine).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    )
    ud = ev.groupBy("user_id").agg(F.min("d").alias("first_d"))
    daily = ud.groupBy(F.col("first_d").alias("d")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    spine = ev.select("d").distinct()
    j = spine.join(daily, "d", "left").select(
        "d", F.coalesce("new_users", F.lit(0)).alias("new_users")
    )
    wr = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )  # day spine: tiny, calendar-bounded
    return (
        j.select(
            F.col("d").alias("day"),
            "new_users",
            F.sum("new_users").over(wr).cast("long").alias("cumulative_users"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------
# Skyline / pareto frontier (2-D): orders that are not dominated on
# (earlier date, higher total price). The distributed trick: a per-
# date MAX pre-aggregate collapses the data-scaled input to a
# calendar-bounded frame FIRST; the dominance test is then a prefix
# max over that tiny date spine — raw rows never see a window, and
# the frontier join-back is a broadcast.
# --------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH dm AS (
  SELECT o_orderdate AS d, MAX(o_totalprice) AS mx
  FROM orders GROUP BY 1
),
pm AS (
  SELECT d, mx,
         MAX(mx) OVER (
           ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prevmax
  FROM dm
),
fr AS (
  SELECT d, mx FROM pm WHERE prevmax IS NULL OR mx > prevmax
)
SELECT f.d AS frontier_date,
       f.mx AS frontier_price,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM fr f JOIN orders o
  ON o.o_orderdate = f.d AND o.o_totalprice = f.mx
GROUP BY f.d, f.mx
ORDER BY frontier_date
"""


@register("skyline_orders_date_price", oracle=_SKYLINE_ORACLE)
def skyline_orders_date_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of orders over (minimize order date, maximize
    total price): the orders no other order beats on both axes, with
    the count of ties at each frontier point.

    Dominance: A dominates B iff A.date <= B.date, A.price >= B.price,
    one strict. A row survives iff its price equals its date's max AND
    strictly exceeds every earlier date's max — so the whole test
    reduces to (per-date max) + (prefix max over the date spine). The
    per-date aggregate is the only data-scaled shuffle (map-side
    combinable); the unpartitioned prefix-max window rides the
    calendar-bounded date frame (same justification as the
    cumulative-users spine), and the surviving frontier is broadcast
    back to count ties. Pure comparisons, no arithmetic — exact on
    any numeric type.
    """
    orders = load_table(spark, sf_dir, "orders")
    dm = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.max("o_totalprice").alias("mx")
    )
    wp = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, -1
    )  # date spine: tiny, calendar-bounded
    fr = (
        dm.withColumn("prevmax", F.max("mx").over(wp))
        .filter(F.col("prevmax").isNull() | (F.col("mx") > F.col("prevmax")))
        .select("d", "mx")
    )
    return (
        orders.join(
            F.broadcast(fr),
            (F.col("o_orderdate") == F.col("d"))
            & (F.col("o_totalprice") == F.col("mx")),
        )
        .groupBy(
            F.col("d").alias("frontier_date"),
            F.col("mx").alias("frontier_price"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("frontier_date")
    )


# --------------------------------------------------------------------
# SCD2 point-in-time lookup — the CONSUMING side of the SCD2 build
# above: join facts to the dimension version that was valid at an
# as-of instant (here: the user's state one hour BEFORE each
# purchase, i.e. "what were they doing when they decided to buy").
# The interval-containment join is the canonical SCD2 access path;
# per-user version counts are small, so the containment filter rides
# a user-key equi-join — no unbounded range join.
# --------------------------------------------------------------------

_SCD2_LOOKUP_ORACLE = """
WITH c AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
ch AS (
  SELECT user_id, ts, event_id, event_type FROM c
  WHERE prev_type IS NULL OR prev_type <> event_type
),
dim AS (
  SELECT user_id, event_type,
         ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM ch
),
p AS (
  SELECT user_id, ts - INTERVAL 1 HOUR AS asof_ts
  FROM events WHERE event_type = 'purchase'
),
j AS (
  SELECT d.event_type AS state_before
  FROM p JOIN dim d
    ON d.user_id = p.user_id
   AND d.valid_from <= p.asof_ts
   AND (d.valid_to IS NULL OR p.asof_ts < d.valid_to)
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases FROM p)
SELECT j.state_before,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) AS DOUBLE) / CAST(t.n_purchases AS DOUBLE) AS share
FROM j CROSS JOIN tot t
GROUP BY j.state_before, t.n_purchases
ORDER BY j.state_before
"""


@register("scd2_asof_dimension_lookup", oracle=_SCD2_LOOKUP_ORACLE)
def scd2_asof_dimension_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of the SCD2 user-state attribute one hour before
    each purchase: build the validity intervals (same two-window pass
    as scd2_user_type_history), then an interval-containment join
    keyed on user_id.

    Purchases whose as-of instant precedes the user's first recorded
    state simply don't match (inner join) — the share column is over
    ALL purchases, so the missing mass is visible. At 100 TB the
    equi-key is the user id and the containment test is a per-user
    filter over that user's handful of versions; the degenerate
    many-versions user is the same skew AQE handles in every other
    user-keyed join here.
    """
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lag("event_type").over(wo).alias("prev_type"),
    ).filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    dim = ch.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wo).alias("valid_to"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("asof_ts")
    )
    # total rides the plan as a broadcast single-row aggregate — an
    # eager .count() here would rescan events once per invocation
    tot = p.agg(F.count(F.lit(1)).alias("n_purchases"))
    j = p.join(dim, "user_id").filter(
        (F.col("valid_from") <= F.col("asof_ts"))
        & (F.col("valid_to").isNull() | (F.col("asof_ts") < F.col("valid_to")))
    )
    return (
        j.groupBy(F.col("event_type").alias("state_before"))
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "state_before",
            "n",
            (
                F.col("n").cast("double")
                / F.col("n_purchases").cast("double")
            ).alias("share"),
        )
        .orderBy("state_before")
    )


# --------------------------------------------------------------------
# Funnel TIME-TO-CONVERT: how long after the first view does the
# first subsequent purchase happen, and the latency distribution
# (p50/p90). The companion to funnel_view_click_purchase's conversion
# COUNTS. Everything partitions/aggregates by user before any global
# step; lag math is integer microseconds (exact), only the final
# percentiles run on the (converted-users-sized, per-event-tiny)
# lag frame.
# --------------------------------------------------------------------

_TTC_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY 1
),
p AS (
  SELECT e.user_id,
         MIN(epoch_us(e.ts) - epoch_us(v.first_view)) AS lag_us
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= v.first_view
  GROUP BY 1
)
SELECT
  CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewers,
  CAST(COUNT(*) AS BIGINT) AS n_converted,
  CAST(MIN(lag_us) AS BIGINT) AS min_lag_us,
  quantile_cont(CAST(lag_us AS DOUBLE), 0.5) AS p50_lag_us,
  quantile_cont(CAST(lag_us AS DOUBLE), 0.9) AS p90_lag_us
FROM p
"""


@register("funnel_time_to_convert", oracle=_TTC_ORACLE)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase conversion latency: per-user first view, first
    subsequent purchase, integer-microsecond lag, p50/p90."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.unix_micros("ts") - F.unix_micros("first_view")
            ).alias("lag_us")
        )
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_viewers"))
    return p.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("lag_us").cast("long").alias("min_lag_us"),
        F.expr("percentile(CAST(lag_us AS DOUBLE), 0.5)").alias("p50_lag_us"),
        F.expr("percentile(CAST(lag_us AS DOUBLE), 0.9)").alias("p90_lag_us"),
    ).crossJoin(F.broadcast(nv)).select(
        "n_viewers",
        "n_converted",
        "min_lag_us",
        "p50_lag_us",
        "p90_lag_us",
    )

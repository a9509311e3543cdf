"""Time-series operators: calendar-spine gap fill with LOCF, and
OHLC-style downsampling — the hypertable/rollup surface a telemetry
or market-data pipeline expects from the engine.

Spark-first shapes:
- The hour spine is ``sequence()`` + ``explode`` off the aggregated
  min/max bounds — generated, never collected; the dense grid is
  spine × distinct-keys with the (tiny) key side broadcast.
- LOCF is ``last(value, ignorenulls=True)`` over an
  UNBOUNDED-PRECEDING row frame per series — Spark's native
  running-window machinery, no UDF, no sort beyond the window's own.
- OHLC picks open/close via row_number over (ts, event_id) — a
  deterministic tie-broken ordering both engines reproduce (min_by /
  arg_min are NOT used: their tie behavior under equal timestamps is
  engine-specific).

Scale notes (100 TB): the heavy input collapses to per-(series, hour)
partials BEFORE any window; the spine join is broadcast (hours ×
series is tiny relative to raw events); the LOCF window partitions by
series so state never exceeds one series' hours on one task. Skewed
series (one hot event_type) would need the series key salted into
sub-ranges with a carry-forward merge — documented, not needed at
these SFs.

Reference parity: the reference has no time-series surface; this is
part of the training-pipeline extension (brief: hypertable rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from workshop3_etl_spark.functions import metrics as M
from workshop3_etl_spark.functions.canon import cents_sql
from workshop3_etl_spark.plans.registry import register
from workshop3_etl_spark.sources.tables import load_table

_GAPFILL_ORACLE = """
WITH agg AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS decimal(27,2))) AS DOUBLE) AS tv
  FROM events
  GROUP BY 1, 2
),
b AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM agg),
spine AS (
  SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b
),
grid AS (
  SELECT s.h, t.event_type
  FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM agg) t
),
j AS (
  SELECT g.h, g.event_type, a.n, a.tv
  FROM grid g LEFT JOIN agg a ON g.h = a.h AND g.event_type = a.event_type
)
SELECT
  h AS hour_start,
  event_type,
  COALESCE(n, CAST(0 AS BIGINT)) AS n_events,
  CAST(n IS NULL AS BOOLEAN) AS is_gap,
  last_value(tv IGNORE NULLS) OVER (
    PARTITION BY event_type ORDER BY h
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS locf_total_value
FROM j
ORDER BY event_type, hour_start
"""


@register("ts_gapfill_locf_hourly", oracle=_GAPFILL_ORACLE)
def ts_gapfill_locf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event_type: calendar-spine gap fill,
    zero-filled counts, and last-observation-carried-forward totals."""
    from workshop3_etl_spark.functions.cache import materialize_and_release

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("h"), "event_type", "value"
    )
    agg = (
        ev.groupBy("h", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), M.dsum("value", "tv"))
        # referenced three times (bounds, key set, grid join); persist
        # so events is scanned once, released before return
        .persist()
    )
    bounds = agg.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    spine = bounds.select(
        F.explode(
            F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    types = agg.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    j = grid.join(agg, ["h", "event_type"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    result = j.select(
        F.col("h").alias("hour_start"),
        "event_type",
        F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_events"),
        F.col("n").isNull().alias("is_gap"),
        F.last("tv", ignorenulls=True).over(w).alias("locf_total_value"),
    ).orderBy("event_type", "hour_start")
    return materialize_and_release(result, agg)


_OHLC_ORACLE = """
WITH r AS (
  SELECT
    date_trunc('hour', ts) AS h,
    event_type,
    value,
    ROW_NUMBER() OVER (
      PARTITION BY date_trunc('hour', ts), event_type
      ORDER BY ts, event_id
    ) AS rn_a,
    ROW_NUMBER() OVER (
      PARTITION BY date_trunc('hour', ts), event_type
      ORDER BY ts DESC, event_id DESC
    ) AS rn_d
  FROM events
  WHERE value IS NOT NULL
)
SELECT
  h AS hour_start,
  event_type,
  CAST(COUNT(*) AS BIGINT) AS n_ticks,
  CAST(SUM(CASE WHEN rn_a = 1 THEN value ELSE 0 END) AS DOUBLE) AS open_value,
  MAX(value) AS high_value,
  MIN(value) AS low_value,
  CAST(SUM(CASE WHEN rn_d = 1 THEN value ELSE 0 END) AS DOUBLE) AS close_value
FROM r
GROUP BY 1, 2
ORDER BY hour_start, event_type
LIMIT 500
"""


@register("ts_ohlc_hourly_downsample", oracle=_OHLC_ORACLE)
def ts_ohlc_hourly_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) downsample of event values
    per type, open/close tie-broken by (ts, event_id).

    The open/close extraction is SUM(CASE rn=1) folded into the same
    grouped aggregate as high/low — one window pass + one aggregate,
    no self-join. (A single first-row value summed over the group is
    the value itself; 'ELSE 0' keeps the sum exact in both engines.)
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.date_trunc("hour", "ts").alias("h"),
            "event_type",
            "value",
            "ts",
            "event_id",
        )
    )
    wa = Window.partitionBy("h", "event_type").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    wd = Window.partitionBy("h", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    r = ev.select(
        "h",
        "event_type",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return (
        r.groupBy("h", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum(F.when(F.col("rn_a") == 1, F.col("value")).otherwise(0.0))
            .cast("double")
            .alias("open_value"),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.sum(F.when(F.col("rn_d") == 1, F.col("value")).otherwise(0.0))
            .cast("double")
            .alias("close_value"),
        )
        .select(
            F.col("h").alias("hour_start"),
            "event_type",
            "n_ticks",
            "open_value",
            "high_value",
            "low_value",
            "close_value",
        )
        .orderBy("hour_start", "event_type")
        .limit(500)
    )


# --------------------------------------------------------------------
# Linear-interpolation gap fill — the two-sided sibling of LOCF:
# missing hours take the line between the previous and next
# observation; leading/trailing gaps (no bracketing pair) stay NULL.
# --------------------------------------------------------------------

_INTERP_ORACLE = """
WITH agg AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS decimal(27,2))) AS DOUBLE) AS tv
  FROM events
  GROUP BY 1, 2
),
b AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM agg),
spine AS (
  SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b
),
grid AS (
  SELECT s.h, t.event_type
  FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM agg) t
),
j AS (
  SELECT g.h, g.event_type, a.tv,
         CAST(epoch(g.h) AS BIGINT) / 3600 AS hi
  FROM grid g LEFT JOIN agg a ON g.h = a.h AND g.event_type = a.event_type
),
w AS (
  SELECT h, event_type, tv, hi,
    last_value(tv IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY hi
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN tv IS NOT NULL THEN hi END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY hi
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
    first_value(tv IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY hi
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN tv IS NOT NULL THEN hi END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY hi
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM j
)
SELECT
  h AS hour_start,
  event_type,
  CAST(tv IS NULL AS BOOLEAN) AS is_gap,
  CASE
    WHEN tv IS NOT NULL THEN tv
    WHEN pv IS NULL OR nv IS NULL THEN NULL
    ELSE pv + (nv - pv) * (CAST(hi - ph AS DOUBLE)
                           / CAST(nh - ph AS DOUBLE))
  END AS interp_total_value
FROM w
ORDER BY event_type, hour_start
"""


@register("ts_gapfill_interp_hourly", oracle=_INTERP_ORACLE)
def ts_gapfill_interp_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across hourly gaps per series.

    Same spine/grid as the LOCF variant; the interpolation pulls
    (prev value, prev hour) from an UNBOUNDED-PRECEDING frame and
    (next value, next hour) from a CURRENT-TO-FOLLOWING frame — both
    per-series partitioned. Hour indexes are integer epoch-hours so
    the gap ratio is an exact small-integer division in both engines.
    """
    from workshop3_etl_spark.functions.cache import materialize_and_release

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("h"), "event_type", "value"
    )
    agg = (
        ev.groupBy("h", "event_type")
        .agg(M.dsum("value", "tv"))
        .persist()
    )
    bounds = agg.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = agg.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    j = grid.join(agg, ["h", "event_type"], "left").withColumn(
        "hi", (F.unix_micros("h") / F.lit(3_600_000_000)).cast("long")
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hi")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("hi")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hi = F.when(F.col("tv").isNotNull(), F.col("hi"))
    w = j.select(
        "h",
        "event_type",
        "tv",
        "hi",
        F.last("tv", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_hi, ignorenulls=True).over(wp).alias("ph"),
        F.first("tv", ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_hi, ignorenulls=True).over(wn).alias("nh"),
    )
    interp = (
        F.when(F.col("tv").isNotNull(), F.col("tv"))
        .when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (
                (F.col("hi") - F.col("ph")).cast("double")
                / (F.col("nh") - F.col("ph")).cast("double")
            )
        )
    )
    result = w.select(
        F.col("h").alias("hour_start"),
        "event_type",
        F.col("tv").isNull().alias("is_gap"),
        interp.alias("interp_total_value"),
    ).orderBy("event_type", "hour_start")
    return materialize_and_release(result, agg)


# --------------------------------------------------------------------
# EWMA smoothing over a bounded 24-hour window. Weight for a lag of k
# hours is 2^-k (a 1-hour half-life): every weight is an exact dyadic
# double, so the weighted products and the fixed left-associated
# summation tree are identical IEEE sequences in both engines —
# a fractional half-life (0.5^(k/6)) would put irrational libm pow()
# values in the hashed output.
# --------------------------------------------------------------------

_EWMA_LAGS = 24


def _ewma_oracle() -> str:
    num_terms = []
    den_terms = []
    for k in range(_EWMA_LAGS):
        w = 0.5**k  # exact dyadic constant, prints exactly
        lagk = f"lag(xv, {k}) OVER (PARTITION BY event_type ORDER BY h)"
        num_terms.append(f"COALESCE({lagk}, 0.0) * {w!r}")
        den_terms.append(f"(CASE WHEN {lagk} IS NULL THEN 0.0 ELSE {w!r} END)")
    num = " + ".join(num_terms)
    den = " + ".join(den_terms)
    return f"""
WITH agg AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         CAST(SUM(CAST(value AS decimal(27,2))) AS DOUBLE) AS xv
  FROM events
  GROUP BY 1, 2
)
SELECT h AS hour_start, event_type, xv AS raw_value,
       ({num}) / ({den}) AS ewma_value
FROM agg
ORDER BY event_type, hour_start
"""


@register("ts_ewma_hourly_value", oracle=_ewma_oracle())
def ts_ewma_hourly_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of hourly event value per
    type: 24-lag bounded window, weights 2^-k (1-hour half-life).

    The EWMA is a lag-chain — 24 lag() expressions sharing ONE window
    sort — rather than a recursive state op: dyadic weights and a
    fixed left-associated summation tree make the result bit-identical
    across engines, and the whole expression stays inside Spark's
    window codegen (no UDF, no recursion). The hourly pre-aggregate
    collapses the corpus before the window, so the windowed frame is
    O(series × hours) however big the raw events are.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("h"), "event_type", "value"
    )
    agg = ev.groupBy("h", "event_type").agg(
        M.dsum("value", "xv")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    num = den = None
    for k in range(_EWMA_LAGS):
        wk = 0.5**k
        lagk = F.lag("xv", k).over(w)
        num_k = F.coalesce(lagk, F.lit(0.0)) * F.lit(wk)
        den_k = F.when(lagk.isNull(), F.lit(0.0)).otherwise(F.lit(wk))
        num = num_k if num is None else num + num_k
        den = den_k if den is None else den + den_k
    return agg.select(
        F.col("h").alias("hour_start"),
        "event_type",
        F.col("xv").alias("raw_value"),
        (num / den).alias("ewma_value"),
    ).orderBy("event_type", "hour_start")


# --------------------------------------------------------------------
# Seasonal-naive forecast error: predict each hour's total value by
# the SAME hour one day earlier (period = 24h) and score the MAE per
# series — the standard baseline every real forecasting model must
# beat, and a drift alarm when the error jumps.
# --------------------------------------------------------------------

_SEASONAL_ORACLE = """
WITH agg AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         SUM(CAST(value AS decimal(27,2))) AS tv
  FROM events
  GROUP BY 1, 2
),
ix AS (
  SELECT event_type,
         CAST(epoch(h) AS BIGINT) // 3600 AS hi,
         tv
  FROM agg
),
j AS (
  SELECT c.event_type, ABS(c.tv - p.tv) AS abs_err
  FROM ix c JOIN ix p
    ON p.event_type = c.event_type AND p.hi = c.hi - 24
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_scored,
       CAST(SUM(abs_err) AS DOUBLE) AS sum_abs_err,
       CAST(SUM(abs_err) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mae
FROM j
GROUP BY event_type
ORDER BY event_type
"""


@register("ts_seasonal_naive_mae", oracle=_SEASONAL_ORACLE)
def ts_seasonal_naive_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (24-hour lag) forecast MAE per event type over
    the hourly total-value series.

    The hourly rollup is one map-side-combinable aggregate with
    decimal(27,2) sums (value is fixed-2-decimal, so the cast and the
    commutative decimal addition are exact — the profile.py moment
    discipline); the seasonal lag is an EQUI-join on the integer hour
    index minus 24, not a row-offset window, so calendar gaps in a
    series can't silently misalign the season. Both the join and the
    final per-type MAE ride frames whose size is O(hours x types) —
    calendar-bounded, independent of raw event volume. The MAE
    division is exact-decimal-to-double, identical IEEE in both
    engines.
    """
    agg = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", "ts").alias("h"), "event_type"
        )
        .agg(F.sum(F.col("value").cast("decimal(27,2)")).alias("tv"))
    )
    ix = agg.select(
        "event_type",
        F.expr("unix_micros(h) div 3600000000").alias("hi"),
        "tv",
    )
    cur = ix
    prev = ix.select(
        "event_type", (F.col("hi") + 24).alias("hi"), F.col("tv").alias("pv")
    )
    j = cur.join(prev, ["event_type", "hi"]).select(
        "event_type", F.abs(F.col("tv") - F.col("pv")).alias("abs_err")
    )
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum("abs_err").cast("double").alias("sum_abs_err"),
            (
                F.sum("abs_err").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mae"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------
# Exponentially decayed popularity counters: each event contributes
# 2^-(age in days) to its type's score — the batch equivalent of the
# decayed counters trending/ranking systems keep. Same dyadic-weight
# discipline as attribution_time_decay_revenue: weights scaled to the
# integer 2^(HORIZON - age), summed exactly, divided once at the end.
# --------------------------------------------------------------------

_DECAY_HORIZON_DAYS = 30

_POP_ORACLE = f"""
WITH mx AS (
  SELECT CAST(MAX(date_trunc('day', ts)) AS DATE) AS md FROM events
),
d AS (
  SELECT event_type,
         date_diff('day', CAST(date_trunc('day', ts) AS DATE), mx.md)
           AS age
  FROM events CROSS JOIN mx
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN age <= {_DECAY_HORIZON_DAYS}
                THEN CAST(1 AS BIGINT) << ({_DECAY_HORIZON_DAYS} - age)
                ELSE 0 END) AS DOUBLE)
         / {2.0 ** _DECAY_HORIZON_DAYS} AS decayed_count
FROM d
GROUP BY event_type
ORDER BY event_type
"""


@register("ts_decayed_popularity", oracle=_POP_ORACLE)
def ts_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decayed event-type popularity: raw count next to the
    half-life-of-one-day decayed count (events older than the 30-day
    horizon contribute zero).

    One scalar max-day broadcast + one map-side-combinable aggregate;
    the decayed sum is an exact integer (each event contributes
    2^(30-age), total < 2^31 per billion daily events — decimal-sum
    headroom at any realistic volume), divided by 2^30 once at the
    end, so the surfaced double is bit-identical cross-engine and
    independent of partitioning. A streaming job keeps the same
    counter incrementally by multiplying yesterday's score by 1/2 and
    adding today's count — this query is its batch oracle.
    """
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.date_trunc("day", "ts")).cast("date").alias("md"))
    d = ev.crossJoin(F.broadcast(mx)).select(
        "event_type",
        F.datediff(F.col("md"), F.date_trunc("day", "ts").cast("date")).alias(
            "age"
        ),
    )
    w = F.when(
        F.col("age") <= _DECAY_HORIZON_DAYS,
        F.expr(
            f"shiftleft(cast(1 as bigint), {_DECAY_HORIZON_DAYS} - age)"
        ),
    ).otherwise(F.lit(0).cast("long"))
    return (
        d.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(w).cast("double") / F.lit(2.0 ** _DECAY_HORIZON_DAYS))
            .alias("decayed_count"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------
# SWEEP-LINE interval concurrency: how many orders are actively
# shipping (between their first and last lineitem shipdate) on each
# day. The naive plan — join every interval against every calendar day
# it covers — is O(rows x duration) and explodes at scale. The
# sweep-line encoding is O(2 intervals): +1 at the interval start, -1
# the day after it ends, aggregate deltas per day (map-side
# combinable, narrow int pairs), then one running sum over the DAY
# SPINE, whose cardinality is calendar-bounded and does not grow with
# data volume (same justification as the skyline / cumulative-users
# spines).
# --------------------------------------------------------------------

_SHIPPING_CONCURRENCY_ORACLE = """
WITH iv AS (
  SELECT l_orderkey,
         MIN(l_shipdate) AS d0,
         MAX(l_shipdate) AS d1
  FROM lineitem GROUP BY 1
),
deltas AS (
  SELECT d0 AS d, 1 AS delta FROM iv
  UNION ALL
  SELECT d1 + INTERVAL 1 DAY, -1 FROM iv
),
daily AS (
  SELECT CAST(d AS DATE) AS d, CAST(SUM(delta) AS BIGINT) AS net_change
  FROM deltas GROUP BY 1
)
SELECT
  d,
  net_change,
  CAST(SUM(net_change) OVER (
    ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS open_orders
FROM daily
ORDER BY d
"""


@register("concurrency_shipping_orders_daily", oracle=_SHIPPING_CONCURRENCY_ORACLE)
def concurrency_shipping_orders_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Daily count of orders mid-shipment (first lineitem shipped,
    last not yet) via sweep-line delta encoding.

    The interval derivation is one map-side-combinable groupBy
    (orderkey -> min/max shipdate); each interval then contributes
    exactly two integer deltas, and the running sum at day d equals
    the number of intervals covering d. Output rows = change-point
    days only (the step function is constant between them), so the
    result stays calendar-bounded at any SF.
    """
    iv = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .groupBy("l_orderkey")
        .agg(
            F.min("l_shipdate").alias("d0"),
            F.max("l_shipdate").alias("d1"),
        )
    )
    deltas = iv.select(
        F.expr(
            "stack(2, cast(d0 as date), 1,"
            " date_add(cast(d1 as date), 1), -1) AS (d, delta)"
        )
    )
    daily = deltas.groupBy("d").agg(
        F.sum("delta").cast("long").alias("net_change")
    )
    wr = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )  # day spine: tiny, calendar-bounded
    return daily.select(
        "d",
        "net_change",
        F.sum("net_change").over(wr).cast("long").alias("open_orders"),
    ).orderBy("d")


# --------------------------------------------------------------------
# CUSUM change-point scores: sequential recurrence as two windows.
# --------------------------------------------------------------------

_CUSUM_TOPK = 10

_CUSUM_ORACLE = f"""
WITH hours AS (
  SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
b AS (
  SELECT MIN(h) AS mn, MAX(h) AS mx, CAST(SUM(n) AS BIGINT) AS total
  FROM hours
),
spine AS (
  SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h,
         total // (datediff('hour', mn, mx) + 1) AS k
  FROM b
),
filled AS (
  SELECT s.h, COALESCE(hours.n, CAST(0 AS BIGINT)) AS n, s.k
  FROM spine s LEFT JOIN hours ON s.h = hours.h
),
rs AS (
  SELECT h, n,
         CAST(SUM(n - k) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS rsum
  FROM filled
),
cusum AS (
  SELECT h, n,
         rsum - LEAST(CAST(0 AS BIGINT),
                      MIN(rsum) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING))
           AS s
  FROM rs
)
SELECT h AS hour_ts, n AS n_events, CAST(s AS BIGINT) AS cusum
FROM cusum
ORDER BY s DESC, h
LIMIT {_CUSUM_TOPK}
"""


@register("ts_cusum_changepoints", oracle=_CUSUM_ORACLE)
def ts_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top change-point hours by one-sided CUSUM score over the
    hourly event-count series (gap hours count as 0 via the calendar
    spine). The sequential recurrence s_t = max(0, s_{t-1} + (x_t-k))
    is computed RELATIONALLY via its prefix identity
    s_t = RS_t - min(0, min_{j<=t} RS_j) — a running sum and a
    running min, both over the aggregated hour spine (two window
    passes over calendar-bounded rows; the raw events see only the
    hourly groupBy, the skyline/concurrency spine discipline). The
    drift allowance k = total div n_hours is integer division, so
    every value in the pipeline is an exact integer — bit-stable
    under any partitioning.

    At 100 TB the spine length is calendar hours (e.g. ~90k for a
    decade), so the unpartitioned spine windows stay trivially small
    no matter the corpus; the only corpus-scale work is the hourly
    count shuffle."""
    hours = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    b = hours.agg(
        F.min("h").alias("mn"),
        F.max("h").alias("mx"),
        F.sum("n").cast("long").alias("total"),
    )
    spine = b.select(
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias(
            "h"
        ),
        F.expr("total div (timestampdiff(HOUR, mn, mx) + 1)").alias("k"),
    )
    filled = spine.join(F.broadcast(hours), "h", "left").select(
        "h", F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n"), "k"
    )
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    rs = filled.select(
        "h", "n", F.sum(F.col("n") - F.col("k")).over(w).alias("rsum")
    )
    cusum = rs.select(
        "h",
        "n",
        (
            F.col("rsum")
            - F.least(F.lit(0).cast("long"), F.min("rsum").over(w))
        ).alias("s"),
    )
    return (
        cusum.orderBy(F.desc("s"), "h")
        .limit(_CUSUM_TOPK)
        .select(
            F.col("h").alias("hour_ts"),
            F.col("n").alias("n_events"),
            F.col("s").cast("long").alias("cusum"),
        )
    )


# --------------------------------------------------------------------
# Exact autocorrelation function of the daily revenue series.
# --------------------------------------------------------------------

_ACF_MAX_LAG = 7

_ACF_ORACLE = f"""
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(cast(floor(o_totalprice * 100e0 + 0.5e0) as bigint))
              AS BIGINT) AS x
  FROM orders GROUP BY 1
),
b AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM daily),
spine AS (
  SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
  FROM b
),
filled AS (
  SELECT s.d, COALESCE(daily.x, CAST(0 AS BIGINT)) AS x
  FROM spine s LEFT JOIN daily ON s.d = daily.d
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(x) AS DECIMAL(38,0)) AS s,
         SUM(CAST(x AS DECIMAL(38,0)) * x) AS q
  FROM filled
),
lags AS (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag),
pairs AS (
  SELECT l.lag,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         SUM(CAST(a.x AS DECIMAL(38,0)) * b.x) AS p,
         CAST(SUM(a.x) AS DECIMAL(38,0)) AS h,
         CAST(SUM(b.x) AS DECIMAL(38,0)) AS t
  FROM lags l
  JOIN filled a ON TRUE
  JOIN filled b ON b.d = a.d + CAST(l.lag AS INTEGER) * INTERVAL 1 DAY
  GROUP BY l.lag
)
SELECT p.lag, p.n_pairs,
       -- numerator/denominator are hugeint-backed decimals far past
       -- 2^64 (and the numerator can be negative): the VARCHAR route
       -- keeps DuckDB's double conversion correctly rounded
       -- (canon.dec2dbl_duck rationale)
       CAST(CAST(CAST(g.n_days AS DECIMAL(38,0)) * g.n_days * p.p
              - CAST(g.n_days AS DECIMAL(38,0)) * g.s * (p.h + p.t)
              + (CAST(g.n_days AS DECIMAL(38,0)) - p.lag) * g.s * g.s
            AS VARCHAR) AS DOUBLE)
         / CAST(CAST(CAST(g.n_days AS DECIMAL(38,0)) * g.n_days * g.q
                  - CAST(g.n_days AS DECIMAL(38,0)) * g.s * g.s
                AS VARCHAR) AS DOUBLE) AS autocorr
FROM pairs p CROSS JOIN g
ORDER BY p.lag
"""


@register("ts_acf_daily_revenue", oracle=_ACF_ORACLE)
def ts_acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily order-revenue series at lags
    1..7, computed EXACTLY: the centered cross-products are expanded
    into raw integer-cents moments scaled by N^2,

        N^2 * c_k = N^2 * P_k - N * S * (H_k + T_k) + (N - k) * S^2

    (P_k = sum x_t*x_{t+k}, H/T = head/tail sums, S = series total),
    so every numerator and the variance denominator is an exact
    decimal(38,0) integer and r_k = c_k / c_0 is ONE double division
    of two exactly-represented integers -- bit-identical across
    engines and partitionings. Weekly seasonality in order flow shows
    up as a positive r_7 spike vs its neighbors.

    Spark-first shape: corpus-scale work is a single map-side-
    combinable groupBy(o_orderdate); everything after rides the
    calendar-day spine (gap days filled with 0, the CUSUM/skyline
    spine discipline). The lag pairing is an equi-join of the spine
    against itself on a shifted date key -- no window state, no
    theta join. At 100 TB the spine is still ~2.4k rows.

    Magnitude bound: exactness needs N^2*Q < 10^38 -- holds through
    ~sf3000; re-audit if the driver ever hash-checks beyond that
    (same bound family as the other decimal-moment operators).

    Reference parity: generalizes the reference's per-year KPI trend
    eyeballing (notebook EDA cells) into a first-class seasonality
    statistic.
    """
    from workshop3_etl_spark.functions.canon import cents_sql

    cents = F.expr(cents_sql("o_totalprice"))
    daily = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderdate").alias("d"), cents.alias("xc"))
        .groupBy("d")
        .agg(F.sum("xc").cast("long").alias("x"))
    )
    b = daily.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    spine = b.select(
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    filled = spine.join(F.broadcast(daily), "d", "left").select(
        "d", F.coalesce(F.col("x"), F.lit(0).cast("long")).alias("x")
    )
    from workshop3_etl_spark.functions.cache import materialize_and_release

    filled = filled.persist()
    try:
        g = filled.agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("x").cast("decimal(38,0)").alias("s"),
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("q"),
        )
        lags = spark.range(1, _ACF_MAX_LAG + 1).select(
            F.col("id").alias("lag")
        )
        a = filled.crossJoin(F.broadcast(lags)).select(
            "lag",
            F.col("x").alias("xa"),
            F.expr("date_add(d, cast(lag as int))").alias("d2"),
        )
        pairs = (
            a.join(
                F.broadcast(filled.select(F.col("d").alias("d2"),
                                          F.col("x").alias("xb"))),
                "d2",
            )
            .groupBy("lag")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.sum(F.col("xa").cast("decimal(38,0)") * F.col("xb")).alias(
                    "p"
                ),
                F.sum("xa").cast("decimal(38,0)").alias("h"),
                F.sum("xb").cast("decimal(38,0)").alias("t"),
            )
        )
        nd = F.col("n_days").cast("decimal(38,0)")
        num = (
            nd * F.col("n_days") * F.col("p")
            - nd * F.col("s") * (F.col("h") + F.col("t"))
            + (nd - F.col("lag")) * F.col("s") * F.col("s")
        )
        den = nd * F.col("n_days") * F.col("q") - nd * F.col("s") * F.col("s")
        out = (
            pairs.crossJoin(F.broadcast(g))
            .select(
                "lag",
                "n_pairs",
                (num.cast("double") / den.cast("double")).alias("autocorr"),
            )
            .orderBy("lag")
        )
        out = materialize_and_release(out, filled)
    except Exception:
        filled.unpersist()
        raise
    return out


# --------------------------------------------------------------------
# Holt linear-trend forecast (double exponential smoothing, alpha =
# beta = 1/2): the trend-aware upgrade of ts_ewma_hourly_value and
# the model that ts_seasonal_naive_mae's baseline exists to be
# beaten by. The recurrence
#
#   l_t = a*x_t + (1-a)*(l_{t-1} + b_{t-1})
#   b_t = g*(l_t - l_{t-1}) + (1-g)*b_{t-1}
#
# is inherently sequential, so it runs as ONE in-row fold over the
# day-ordered value array (the bounded-spine pattern: the corpus
# collapses to O(days) rows in a map-side-combinable aggregate
# first; the fold is per-row expression work). Cross-engine
# determinism: the state rides a DOUBLE[3] = [level, trend, sse]
# ARRAY, not a struct — DuckDB 1.0 evaluates struct_pack lambda
# fields SEQUENTIALLY (later fields see already-updated acc fields;
# probed and confirmed), while list elements bind simultaneously in
# both engines, so the array fold is the one shape whose left fold
# is engine-identical. Dyadic smoothing constants are e0 exponent
# literals (DOUBLE in both dialects) and every operation is
# fixed-order IEEE double arithmetic. sse accumulates one-step-ahead
# forecast errors — the in-sample score to compare against the
# seasonal-naive MAE.
# --------------------------------------------------------------------

_HOLT_STEP_SPARK = (
    "(acc, x) -> array("
    "5e-1 * element_at(x, 1)"
    " + 5e-1 * (element_at(acc, 1) + element_at(acc, 2)),"
    " 5e-1 * ((5e-1 * element_at(x, 1)"
    " + 5e-1 * (element_at(acc, 1) + element_at(acc, 2)))"
    " - element_at(acc, 1)) + 5e-1 * element_at(acc, 2),"
    " element_at(acc, 3)"
    " + (element_at(x, 1) - (element_at(acc, 1) + element_at(acc, 2)))"
    " * (element_at(x, 1) - (element_at(acc, 1) + element_at(acc, 2))))"
)
_HOLT_STEP_DUCK = (
    "(acc, x) -> ["
    "5e-1 * x[1] + 5e-1 * (acc[1] + acc[2]),"
    " 5e-1 * ((5e-1 * x[1] + 5e-1 * (acc[1] + acc[2])) - acc[1])"
    " + 5e-1 * acc[2],"
    " acc[3] + (x[1] - (acc[1] + acc[2]))"
    " * (x[1] - (acc[1] + acc[2]))]"
)

_HOLT_ORACLE = f"""
WITH d AS (
  SELECT date_trunc('day', ts) AS dd,
         CAST(SUM(CAST(value AS decimal(27,2))) AS DOUBLE) AS xv
  FROM events GROUP BY 1
),
arr AS (
  SELECT list([xv, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)]
              ORDER BY dd) AS w
  FROM d
),
st AS (
  SELECT CAST(len(w) AS BIGINT) AS n_days,
         list_reduce(w, {_HOLT_STEP_DUCK}) AS s
  FROM arr
)
SELECT n_days, s[1] AS level, s[2] AS trend,
       s[1] + s[2] AS forecast_next, s[3] AS sse
FROM st
"""


@register("ts_holt_linear_forecast", oracle=_HOLT_ORACLE)
def ts_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing over daily event value:
    (n_days, level, trend, forecast_next, sse) from one bounded
    in-row fold — see the section design comment for the recurrence
    and the cross-engine fold contract."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("dd"), "value"
    )
    d = ev.groupBy("dd").agg(M.dsum("value", "xv"))
    arr = d.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dd, xv))),"
            " p -> array(p.xv, cast(0 as double),"
            " cast(0 as double))) as w"
        )
    )
    st = arr.selectExpr(
        "cast(size(w) as bigint) as n_days",
        "aggregate(slice(w, 2, size(w) - 1), element_at(w, 1),"
        f" {_HOLT_STEP_SPARK}) as s",
    )
    return st.selectExpr(
        "n_days",
        "element_at(s, 1) as level",
        "element_at(s, 2) as trend",
        "element_at(s, 1) + element_at(s, 2) as forecast_next",
        "element_at(s, 3) as sse",
    )


# --------------------------------------------------------------------
# Classical additive seasonal decomposition (weekly period) of daily
# order revenue: value = trend + seasonal + residual — the
# moving-average decomposition (the STL ancestor) that turns the
# seasonal-naive/Holt forecasters' implicit structure into explicit,
# auditable components.
#
# Exactness ladder: revenue is integer cents (cents_sql canon); the
# centered 7-day trend is surfaced as the INTEGER window sum
# trend_sum7 (not the /7 mean — division would force a rounding
# choice), so the detrended series is the exact integer
# detrended_x7 = 7*value_cents - trend_sum7. The per-day-of-week
# seasonal component is kept as the exact integer pair
# (seasonal_num, seasonal_den) = (sum, count) of detrended_x7 —
# integer floor-division is NOT engine-stable for negatives (DuckDB
# // floors, Spark div truncates), so the mean is exposed as ONE
# double division, and the residual as one further subtraction —
# fixed-order IEEE, bit-identical. Day-of-week is epoch-day mod 7
# (calendar-function-free: Spark dayofweek and DuckDB dayofweek
# disagree on numbering).
#
# Scale: the corpus collapses to the calendar-day spine in one
# map-side-combinable aggregate (~2.5k rows at ANY corpus size); the
# centered window, the 7-row seasonal aggregate, and the joins all
# ride bounded frames. detrended_x7 is int64-exact while daily
# revenue stays under ~1.3e18 cents; the dow sums widen to
# decimal(38,0) beyond ~sf10000 (same bound family as the ACF
# moments).
# --------------------------------------------------------------------

_DECOMP_ORACLE = """
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(cast(floor(o_totalprice * 100e0 + 0.5e0) as bigint))
              AS BIGINT) AS x
  FROM orders GROUP BY 1
),
b AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM daily),
spine AS (
  SELECT CAST(unnest(generate_series(b.mn, b.mx, INTERVAL 1 DAY))
              AS TIMESTAMP) AS d
  FROM b
),
filled AS (
  SELECT s.d, COALESCE(daily.x, CAST(0 AS BIGINT)) AS x
  FROM spine s LEFT JOIN daily ON daily.d = s.d
),
win AS (
  SELECT d, x,
         CAST(date_diff('day', TIMESTAMP '1970-01-01', d) % 7
              AS BIGINT) AS dow,
         CAST(SUM(x) OVER (ORDER BY d
              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
              AS BIGINT) AS w_sum,
         CAST(COUNT(*) OVER (ORDER BY d
              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
              AS BIGINT) AS w_n
  FROM filled
),
det AS (
  SELECT d, dow, x,
         CASE WHEN w_n = 7 THEN w_sum END AS trend_sum7,
         CASE WHEN w_n = 7 THEN 7 * x - w_sum END AS detrended_x7
  FROM win
),
seas AS (
  SELECT dow,
         CAST(SUM(detrended_x7) AS BIGINT) AS seasonal_num,
         CAST(COUNT(detrended_x7) AS BIGINT) AS seasonal_den
  FROM det GROUP BY dow
)
SELECT det.d, det.dow,
       det.x AS revenue_cents,
       det.trend_sum7,
       det.detrended_x7,
       s.seasonal_num, s.seasonal_den,
       CAST(s.seasonal_num AS DOUBLE) / CAST(s.seasonal_den AS DOUBLE)
         AS seasonal_x7,
       CAST(det.detrended_x7 AS DOUBLE)
         - CAST(s.seasonal_num AS DOUBLE) / CAST(s.seasonal_den AS DOUBLE)
         AS residual_x7
FROM det JOIN seas s USING (dow)
ORDER BY det.d
"""


@register("ts_seasonal_decompose_weekly", oracle=_DECOMP_ORACLE)
def ts_seasonal_decompose_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive weekly decomposition of daily order revenue on the
    gap-filled calendar spine: integer centered-7-day trend sum,
    exact integer detrended series (x7 scale), per-day-of-week
    seasonal component as an exact (sum, count) pair plus its single
    double division, and the IEEE residual. See the section comment
    for the exactness ladder and the bounded-frame scale shape.
    """
    from workshop3_etl_spark.functions.cache import materialize_and_release
    from workshop3_etl_spark.functions.canon import cents_sql

    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderdate").alias("d"),
            F.expr(cents_sql("o_totalprice")).alias("xc"),
        )
        .groupBy("d")
        .agg(F.sum("xc").cast("long").alias("x"))
    )
    b = daily.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    spine = b.select(
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    filled = spine.join(F.broadcast(daily), "d", "left").select(
        "d", F.coalesce(F.col("x"), F.lit(0).cast("long")).alias("x")
    )
    # Bounded frame: both windows run over the ~2.5k-row day spine.
    w = Window.orderBy("d").rowsBetween(-3, 3)
    det = (
        filled.select(
            "d",
            "x",
            F.expr("cast(datediff(d, timestamp'1970-01-01') % 7 as bigint)")
            .alias("dow"),
            F.sum("x").over(w).cast("long").alias("w_sum"),
            F.count(F.lit(1)).over(w).cast("long").alias("w_n"),
        )
        .select(
            "d",
            "dow",
            "x",
            F.when(F.col("w_n") == 7, F.col("w_sum")).alias("trend_sum7"),
            F.when(F.col("w_n") == 7, 7 * F.col("x") - F.col("w_sum"))
            .alias("detrended_x7"),
        )
        .persist()
    )
    try:
        seas = det.groupBy("dow").agg(
            F.sum("detrended_x7").cast("long").alias("seasonal_num"),
            F.count("detrended_x7").cast("long").alias("seasonal_den"),
        )
        out = (
            det.join(F.broadcast(seas), "dow")
            .select(
                "d",
                "dow",
                F.col("x").alias("revenue_cents"),
                "trend_sum7",
                "detrended_x7",
                "seasonal_num",
                "seasonal_den",
                (
                    F.col("seasonal_num").cast("double")
                    / F.col("seasonal_den").cast("double")
                ).alias("seasonal_x7"),
                (
                    F.col("detrended_x7").cast("double")
                    - F.col("seasonal_num").cast("double")
                    / F.col("seasonal_den").cast("double")
                ).alias("residual_x7"),
            )
            .orderBy("d")
        )
        out = materialize_and_release(out, det)
    except Exception:
        det.unpersist()
        raise
    return out


# --------------------------------------------------------------------
# Rolling-origin forecast backtest (time-series cross-validation):
# for each of the last 14 origin days t, forecast day t+1 using only
# data <= t, with BOTH registered forecasters — the seasonal-naive
# lag-7 baseline and Holt double-exponential smoothing — and score
# the absolute errors side by side. This is the evaluation harness
# the two forecasters have lacked: ts_seasonal_naive_mae scores
# in-sample, ts_holt_linear_forecast reports in-sample SSE; rolling
# origin is the honest out-of-sample protocol. (14 origins because
# the events table spans 30 days at every SF — the origin count must
# leave a 7-day seasonal lag plus a Holt warm-up prefix.)
#
# Determinism: the daily series is the events-value day rollup
# (decimal sums -> one double cast, the Holt operator's own series);
# each Holt refit is the SAME engine-identical DOUBLE[3] array fold
# (_HOLT_STEP_SPARK / _HOLT_STEP_DUCK — the struct-lambda hazard
# already litigated) over a PREFIX slice, so every per-origin
# forecast is bit-identical cross-engine. The naive leg is pure
# element indexing.
#
# Scale: the corpus collapses to the day spine once (one
# map-side-combinable aggregate); the 28 refits are per-row
# expression folds over a 28-row exploded frame of array slices —
# bounded by the calendar, independent of event volume. (A k-fold
# over thousands of origins would instead carry Welford-style
# mergeable state; 28 explicit refits at ~2.4k days each are ~67k
# fold steps — noise.)
# --------------------------------------------------------------------

_BT_ORIGINS = 14

_BT_ORACLE = f"""
WITH d AS (
  SELECT date_trunc('day', ts) AS dd,
         CAST(SUM(CAST(value AS decimal(27,2))) AS DOUBLE) AS xv
  FROM events GROUP BY 1
),
arr AS (
  SELECT list(dd ORDER BY dd) AS days,
         list([xv, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)]
              ORDER BY dd) AS w,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM d
),
origins AS (
  SELECT a.days, a.w, a.n, u.i
  FROM arr a, unnest(generate_series(a.n - {_BT_ORIGINS}, a.n - 1))
       AS u(i)
  WHERE a.n > {_BT_ORIGINS} + 8
),
fc AS (
  SELECT days[i] AS origin_day,
         days[i + 1] AS horizon_day,
         w[i + 1][1] AS actual,
         w[i - 6][1] AS naive_forecast,
         list_reduce(w[1 : CAST(i AS INT)], {_HOLT_STEP_DUCK}) AS hs
  FROM origins
)
SELECT CAST(origin_day AS TIMESTAMP) AS origin_day,
       CAST(horizon_day AS TIMESTAMP) AS horizon_day,
       actual, naive_forecast,
       hs[1] + hs[2] AS holt_forecast,
       ABS(actual - naive_forecast) AS naive_abs_err,
       ABS(actual - (hs[1] + hs[2])) AS holt_abs_err
FROM fc
ORDER BY origin_day
"""


@register("ts_backtest_rolling_origin", oracle=_BT_ORACLE)
def ts_backtest_rolling_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step rolling-origin backtest over the last 14 days of the
    daily event-value series: per origin the actual, the seasonal-
    naive lag-7 forecast, the prefix-refit Holt forecast, and both
    absolute errors. Reuses the Holt operators' engine-identical
    array-fold step; see the section comment for the protocol and
    the bounded-refit scale note."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("dd"), "value"
    )
    d = ev.groupBy("dd").agg(M.dsum("value", "xv"))
    arr = d.agg(
        F.expr("sort_array(collect_list(dd)) as days"),
        F.expr(
            "transform(array_sort(collect_list(struct(dd, xv))),"
            " p -> array(p.xv, cast(0 as double),"
            " cast(0 as double))) as w"
        ),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    origins = arr.filter(F.col("n") > _BT_ORIGINS + 8).select(
        "days",
        "w",
        F.explode(
            F.expr(f"sequence(n - {_BT_ORIGINS}, n - 1)")
        ).alias("i"),
    )
    fc = origins.selectExpr(
        "element_at(days, cast(i as int)) as origin_day",
        "element_at(days, cast(i as int) + 1) as horizon_day",
        "element_at(element_at(w, cast(i as int) + 1), 1) as actual",
        "element_at(element_at(w, cast(i as int) - 6), 1)"
        " as naive_forecast",
        "aggregate(slice(w, 2, cast(i as int) - 1), element_at(w, 1),"
        f" {_HOLT_STEP_SPARK}) as hs",
    )
    return fc.selectExpr(
        "origin_day",
        "horizon_day",
        "actual",
        "naive_forecast",
        "element_at(hs, 1) + element_at(hs, 2) as holt_forecast",
        "abs(actual - naive_forecast) as naive_abs_err",
        "abs(actual - (element_at(hs, 1) + element_at(hs, 2)))"
        " as holt_abs_err",
    ).orderBy("origin_day")


# --------------------------------------------------------------------
# Robust trend: Theil-Sen median slope + Mann-Kendall trend test over
# the daily event-value series. OLS slopes (ts_holt / the backtest)
# chase outlier days; the Theil-Sen estimator (median of all pairwise
# slopes) has a 29% breakdown point and Mann-Kendall gives a
# distribution-free monotone-trend decision — the standard robust
# pairing for "is this telemetry series actually drifting?".
#
# Exactness ladder (no libm in any hashed column):
# - Daily values are integer cents (the cents_sql canon), day index
#   t = datediff from the spine start, gap days filled with 0 (the
#   CUSUM calendar-spine discipline), so EVERY pairwise quantity
#   (dy, dt, sign) is an exact integer.
# - Pairwise slope dy/dt is carried as the scaled FLOOR quotient
#   floor(dy*1e6 / dt). Integer division is NOT engine-stable for
#   negative numerators (Spark `div` truncates, DuckDB `//` floors —
#   the seasonal-decompose finding), so the floor is built from the
#   non-negative remainder identity fd = (a - ((a % b + b) % b)) / b,
#   exact in both engines for b > 0 (`%` is sign-of-dividend in
#   both). |dy|*1e6 must fit int64 => |dy| < ~9.2e12 cents per day
#   gap — a ~$92B daily swing; envelope stated, re-audit beyond.
# - Median = the LOWER median (rank (n+1)//2 by (key, tie-break)) —
#   a row_number pick, never an engine mean of two middles.
# - Mann-Kendall S = sum of pair signs; Var18 = 18*Var(S) =
#   n(n-1)(2n+5) - sum_ties t(t-1)(2t+5) stays integer (the /18
#   never happens); the alpha = 0.05 two-sided decision with
#   continuity correction z = (|S|-1)/sqrt(Var) is squared into
#   10000 * 18 * (|S|-1)^2 > 38416 * Var18 — exact-rational, the KS
#   recipe.
#
# Scale shape: the corpus pays ONE map-side-combinable daily groupBy;
# everything after runs on the calendar-bounded spine (n days) and
# its pair frame (n(n-1)/2 rows — ~6.7M pairs for a decade of days,
# still a broadcastable side), so cost is calendar-bounded, not
# data-bounded. The pair join is a broadcast non-equi self-join of
# the aggregated spine.
# --------------------------------------------------------------------

_TS_SLOPE_SCALE = 1_000_000
_MK_ZSQ_X1E4 = 38416  # 1.96^2 * 1e4 (two-sided alpha = 0.05)


def _floor_div_sql(num: str, den: str) -> str:
    """Engine-stable floor division for a positive divisor, via the
    non-negative-remainder identity (see section comment). Emits
    plain `/` wrapped in an exact-divisibility form, so the quotient
    is integer in Spark; the oracle twin uses DuckDB `//`."""
    return f"(({num}) - ((({num}) % ({den}) + ({den})) % ({den}))) div ({den})"


def _floor_div_duck(num: str, den: str) -> str:
    return f"(({num}) - ((({num}) % ({den}) + ({den})) % ({den}))) // ({den})"


_THEILSEN_ORACLE = f"""
WITH days AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM({cents_sql('value')}) AS BIGINT) AS x
  FROM events GROUP BY 1
),
b AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM days),
spine AS (
  SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS d,
         mn
  FROM b
),
filled AS (
  SELECT CAST(datediff('day', s.mn, CAST(s.d AS DATE)) AS BIGINT) AS t,
         COALESCE(days.x, CAST(0 AS BIGINT)) AS x
  FROM spine s LEFT JOIN days ON CAST(s.d AS DATE) = days.d
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM filled),
pairs AS (
  SELECT a.t AS ta, p.t AS tb,
         p.x - a.x AS dy, p.t - a.t AS dt,
         CAST(CASE WHEN p.x > a.x THEN 1
                   WHEN p.x < a.x THEN -1 ELSE 0 END AS BIGINT) AS sgn,
         {_floor_div_duck(f'(p.x - a.x) * {_TS_SLOPE_SCALE}', 'p.t - a.t')}
           AS slope_key
  FROM filled a JOIN filled p ON a.t < p.t
),
s AS (
  SELECT CAST(SUM(sgn) AS BIGINT) AS s_stat,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs
),
med AS (
  SELECT slope_key AS slope_x1e6
  FROM (
    SELECT slope_key,
           ROW_NUMBER() OVER (ORDER BY slope_key, ta, tb) AS rn,
           COUNT(*) OVER () AS np
    FROM pairs
  ) WHERE rn = (np + 1) // 2
),
ties AS (
  SELECT COALESCE(CAST(SUM(c * (c - 1) * (2 * c + 5)) AS BIGINT),
                  CAST(0 AS BIGINT)) AS tie_adj
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM filled GROUP BY x)
  WHERE c > 1
),
icept AS (
  SELECT ic AS intercept_x1e6
  FROM (
    SELECT f.x * {_TS_SLOPE_SCALE} - m.slope_x1e6 * f.t AS ic,
           ROW_NUMBER() OVER (
             ORDER BY f.x * {_TS_SLOPE_SCALE} - m.slope_x1e6 * f.t, f.t
           ) AS rn,
           COUNT(*) OVER () AS nd
    FROM filled f CROSS JOIN med m
  ) WHERE rn = (nd + 1) // 2
)
SELECT
  n.n_days,
  s.n_pairs,
  s.s_stat,
  n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - ties.tie_adj
    AS var_s_x18,
  med.slope_x1e6,
  icept.intercept_x1e6,
  CAST(CASE WHEN s.s_stat <> 0
             AND 180000 * (ABS(s.s_stat) - 1) * (ABS(s.s_stat) - 1)
                 > {_MK_ZSQ_X1E4}
                   * (n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                      - ties.tie_adj)
       THEN 1 ELSE 0 END AS INT) AS reject_05
FROM n CROSS JOIN s CROSS JOIN med CROSS JOIN ties CROSS JOIN icept
"""


@register("ts_theilsen_mann_kendall", oracle=_THEILSEN_ORACLE)
def ts_theilsen_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen median slope (x1e6, integer-cents per day) +
    Mann-Kendall trend test (exact S, 18*Var(S), alpha = 0.05
    squared-rational decision with continuity correction) over the
    gap-filled daily event-value series. One corpus shuffle (the
    daily groupBy); the pair frame and both median picks run on
    calendar-bounded rows. See the section comment for the
    engine-stable floor-division identity and the int64 envelope.
    """
    days = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.expr(f"cast(sum({cents_sql('value')}) as bigint)").alias("x"))
    )
    b = days.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    spine = b.select(
        F.explode(
            F.sequence("mn", "mx", F.expr("INTERVAL 1 DAY"))
        ).alias("d"),
        "mn",
    )
    filled = (
        spine.join(F.broadcast(days), "d", "left")
        .select(
            F.datediff("d", "mn").cast("long").alias("t"),
            F.coalesce(F.col("x"), F.lit(0).cast("long")).alias("x"),
        )
        .persist()
    )
    n = filled.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    a = filled.select(
        F.col("t").alias("ta"), F.col("x").alias("xa")
    )
    p = filled.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
    pairs = (
        a.join(F.broadcast(p), F.col("ta") < F.col("tb"))
        .selectExpr(
            "ta",
            "tb",
            "cast(case when xb > xa then 1 when xb < xa then -1"
            " else 0 end as bigint) as sgn",
            f"{_floor_div_sql(f'(xb - xa) * {_TS_SLOPE_SCALE}', 'tb - ta')}"
            " as slope_key",
        )
        .persist()
    )
    s = pairs.agg(
        F.sum("sgn").cast("long").alias("s_stat"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    wmed = Window.orderBy("slope_key", "ta", "tb")
    med = (
        pairs.withColumn("rn", F.row_number().over(wmed))
        .withColumn("np", F.count(F.lit(1)).over(Window.partitionBy()))
        .filter(F.expr("rn = (np + 1) div 2"))
        .select(F.col("slope_key").alias("slope_x1e6"))
    )
    ties = (
        filled.groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)
                ).cast("long"),
                F.lit(0).cast("long"),
            ).alias("tie_adj")
        )
    )
    wic = Window.orderBy("ic", "t")
    icept = (
        filled.crossJoin(F.broadcast(med))
        .select(
            "t",
            (
                F.col("x") * F.lit(_TS_SLOPE_SCALE)
                - F.col("slope_x1e6") * F.col("t")
            ).alias("ic"),
        )
        .withColumn("rn", F.row_number().over(wic))
        .withColumn("nd", F.count(F.lit(1)).over(Window.partitionBy()))
        .filter(F.expr("rn = (nd + 1) div 2"))
        .select(F.col("ic").alias("intercept_x1e6"))
    )
    result = (
        n.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(icept))
        .selectExpr(
            "n_days",
            "n_pairs",
            "s_stat",
            "n_days * (n_days - 1) * (2 * n_days + 5) - tie_adj"
            " as var_s_x18",
            "slope_x1e6",
            "intercept_x1e6",
            "cast(case when s_stat <> 0"
            "            and 180000 * (abs(s_stat) - 1) * (abs(s_stat) - 1)"
            f"               > {_MK_ZSQ_X1E4}"
            "                 * (n_days * (n_days - 1) * (2 * n_days + 5)"
            "                    - tie_adj)"
            " then 1 else 0 end as int) as reject_05",
        )
    )
    from workshop3_etl_spark.functions.cache import materialize_and_release

    return materialize_and_release(result, filled, pairs)

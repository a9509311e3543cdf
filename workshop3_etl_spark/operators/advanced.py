"""Advanced relational surface: correlated subqueries, set operations,
pivot, as-of join, range join, and semi-structured (JSON) columns.

Two styles on display:

- *Shared-SQL queries*: the Spark side executes the SAME SQL text
  (via ``spark.sql`` over registered views) that DuckDB runs as the
  oracle — demonstrating the engine's SQL API is a first-class,
  ANSI-compatible surface (Catalyst rewrites correlated EXISTS/IN to
  semi-joins; no manual decorrelation needed).
- *Composed operators*: as-of join and range join are the operators
  Spark "lacks" as primitives; each is built as the canonical
  scalable composition (union+window carry-forward for as-of;
  equi-key + interval predicate for range join) rather than a Python
  kernel.

Scale notes:
- Catalyst decorrelates EXISTS/IN into left-semi hash joins —
  asserted by the same broadcast/codegen test machinery as the rest.
- The as-of join is ONE shuffle on the key (union then window) —
  the alternative (range self-join then argmax) shuffles twice and
  explodes pairs. This is the pattern for "most recent prior event"
  at any scale.
- The range join keys on the equi column first (user/customer), so
  the interval predicate only filters within key-groups — never a
  cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from workshop3_etl_spark.plans.registry import register
from workshop3_etl_spark.sources.tables import load_table, register_views


# --------------------------------------------------------------------
# Shared-SQL: correlated EXISTS.
# --------------------------------------------------------------------

_EXISTS_SQL = """
SELECT s.s_suppkey, s.s_name, s.s_nationkey
FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey
    AND CAST(l.l_extendedprice AS DOUBLE) > 90000.0
)
ORDER BY s.s_suppkey
"""


@register("sql_exists_high_value_suppliers", oracle=_EXISTS_SQL)
def sql_exists_high_value_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers with any high-value lineitem — the same SQL text runs
    on both engines; Catalyst decorrelates to a left-semi join."""
    register_views(spark, sf_dir, only=("supplier", "lineitem"))
    return spark.sql(_EXISTS_SQL)


# --------------------------------------------------------------------
# Shared-SQL: IN / NOT IN subqueries.
# --------------------------------------------------------------------

_IN_SQL = """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c
WHERE c.c_nationkey IN (
  SELECT n.n_nationkey FROM nation n
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name IN ('ASIA', 'EUROPE')
)
AND c.c_custkey NOT IN (
  SELECT o.o_custkey FROM orders o
  WHERE o.o_totalprice > 400000.0
)
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@register("sql_in_subquery_segments", oracle=_IN_SQL)
def sql_in_subquery_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + NOT IN subqueries (semi/anti-join rewrites) over the
    region→nation→customer→orders chain."""
    register_views(spark, sf_dir, only=("customer", "nation", "region", "orders"))
    return spark.sql(_IN_SQL)


# --------------------------------------------------------------------
# Shared-SQL: INTERSECT / EXCEPT.
# --------------------------------------------------------------------

_SETOP_SQL = """
SELECT 'customer_and_supplier' AS which, n_nationkey FROM (
  SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
  INTERSECT
  SELECT DISTINCT s_nationkey FROM supplier
)
UNION ALL
SELECT 'customer_only' AS which, n_nationkey FROM (
  SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
  EXCEPT
  SELECT DISTINCT s_nationkey FROM supplier
)
ORDER BY which, n_nationkey
"""


@register("sql_setops_nations", oracle=_SETOP_SQL)
def sql_setops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT over nation keys (SURVEY §2.3 notes the
    reference has none — Spark gives them for free)."""
    register_views(spark, sf_dir, only=("customer", "supplier"))
    return spark.sql(_SETOP_SQL)


# --------------------------------------------------------------------
# Pivot (DataFrame API; oracle uses the portable CASE formulation).
# --------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT
  l_returnflag,
  CAST(SUM(CASE WHEN l_linestatus = 'F'
       THEN CAST(l_quantity AS decimal(27,2)) END) AS DOUBLE) AS qty_F,
  CAST(SUM(CASE WHEN l_linestatus = 'O'
       THEN CAST(l_quantity AS decimal(27,2)) END) AS DOUBLE) AS qty_O
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("pivot_qty_by_linestatus", oracle=_PIVOT_ORACLE)
def pivot_qty_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with explicit pivot values (explicit values
    keep the plan single-pass; value-discovery adds a scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,2)")).cast("double"))
        .select(
            "l_returnflag",
            F.col("F").alias("qty_F"),
            F.col("O").alias("qty_O"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------
# As-of join: for each purchase event, the most recent prior 'view'
# event of the same user.
# --------------------------------------------------------------------

_ASOF_ORACLE = """
WITH tagged AS (
  SELECT user_id, event_id, ts, event_type,
         MAX(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) OVER (
           PARTITION BY user_id
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS last_view_us
  FROM events
)
SELECT
  user_id,
  event_id AS purchase_event_id,
  CAST(epoch_us(ts) AS BIGINT) AS purchase_us,
  CAST(last_view_us AS BIGINT) AS last_view_us,
  CAST(epoch_us(ts) - last_view_us AS BIGINT) AS view_to_purchase_us
FROM tagged
WHERE event_type = 'purchase'
ORDER BY user_id, purchase_event_id
"""


@register("asof_join_view_before_purchase", oracle=_ASOF_ORACLE)
def asof_join_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the union+window carry-forward pattern: one
    shuffle on user_id, then a running MAX over prior 'view'
    timestamps — no pairwise range join, no explosion."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    us = F.unix_micros(F.col("ts"))
    last_view = F.max(
        F.when(F.col("event_type") == "view", us)
    ).over(w)
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            last_view.alias("last_view_us"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_event_id"),
            F.unix_micros(F.col("ts")).alias("purchase_us"),
            "last_view_us",
            (F.unix_micros(F.col("ts")) - F.col("last_view_us"))
            .alias("view_to_purchase_us"),
        )
        .orderBy("user_id", "purchase_event_id")
    )


# --------------------------------------------------------------------
# Range join: events within 7 days after the user's order.
# --------------------------------------------------------------------

# The testdata calendars are disjoint (orders 1995-2001, events Jan
# 2024), so a naive date-range join is vacuous — it would "pass" with 0
# rows forever and verify nothing. Align each order onto the event
# month (day-offset mod 30 from a fixed anchor) in pure integer
# microsecond arithmetic, which both engines compute bit-identically,
# so the range join produces real matches. 1704067200000000 =
# epoch_us('2024-01-01 00:00:00 UTC'); 86400000000 = µs/day.
_US_PER_DAY = 86_400_000_000
_ANCHOR_US = 1_704_067_200_000_000

_RANGE_ORACLE = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey,
         {_ANCHOR_US} + (date_diff('day', DATE '1995-01-01',
           CAST(o_orderdate AS DATE)) % 30) * {_US_PER_DAY} AS start_us
  FROM orders
)
SELECT
  o.o_orderkey,
  CAST(COUNT(e.event_id) AS BIGINT) AS n_events_within_7d
FROM o
JOIN events e
  ON e.user_id = o.o_custkey
 AND epoch_us(e.ts) >= o.start_us
 AND epoch_us(e.ts) < o.start_us + 7 * {_US_PER_DAY}
GROUP BY o.o_orderkey
ORDER BY o.o_orderkey
"""


@register("range_join_orders_events_7d", oracle=_RANGE_ORACLE)
def range_join_orders_events_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join keyed on the equi column first: the
    (customer=user) hash join bounds the pair space, the time-range
    predicate filters inside each key group. (The bucketed-interval
    technique from the range-join literature applies when there's no
    equi key; with one, this is the cheaper plan.) Order dates are
    aligned onto the event month (see _RANGE_ORACLE comment) so the
    join is non-degenerate on this dataset."""
    orders = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    start_us = (
        F.lit(_ANCHOR_US)
        + (F.expr("datediff(o_orderdate, date'1995-01-01') % 30").cast("long"))
        * F.lit(_US_PER_DAY)
    )
    o = orders.select("o_orderkey", "o_custkey", start_us.alias("start_us"))
    e_us = F.unix_micros(ev.ts)
    return (
        ev.join(
            o,
            (ev.user_id == o.o_custkey)
            & (e_us >= o.start_us)
            & (e_us < o.start_us + F.lit(7 * _US_PER_DAY)),
        )
        .groupBy("o_orderkey")
        .agg(F.count("event_id").alias("n_events_within_7d"))
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------
# Semi-structured JSON column (events.props).
# --------------------------------------------------------------------

_JSON_ORACLE = """
SELECT
  event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(CAST(json_extract(props, '$.k') AS INTEGER)
       AS decimal(27,0))) AS DOUBLE) AS sum_k,
  CAST(SUM(CAST(CAST(json_extract(props, '$.k') AS INTEGER)
       AS decimal(27,0))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("json_props_extract_stats", oracle=_JSON_ORACLE)
def json_props_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON props column with from_json + typed schema
    (S2/S3's message-parsing semantics on a non-Kafka column) and
    aggregate the extracted field."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("k").cast("decimal(27,0)")).cast("double").alias("sum_k"),
            (
                F.sum(F.col("k").cast("decimal(27,0)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------
# Shared-SQL: GROUPING SETS + grouping_id (finer-grained than
# rollup/cube — exactly the requested subtotal combinations).
# --------------------------------------------------------------------

_GROUPING_SETS_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT)
    AS grouping_level,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(SUM(CAST(l_quantity AS decimal(27,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY grouping_level, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@register("sql_grouping_sets_lineitem", oracle=_GROUPING_SETS_SQL)
def sql_grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() indicators — the same
    SQL text runs on both engines."""
    register_views(spark, sf_dir, only=("lineitem",))
    return spark.sql(_GROUPING_SETS_SQL)


# --------------------------------------------------------------------
# Distribution windows: percent_rank / cume_dist.
# --------------------------------------------------------------------

_PCTRANK_ORACLE = """
SELECT
  o_orderpriority,
  o_orderkey,
  o_totalprice,
  PERCENT_RANK() OVER (
    PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
  ) AS pct_rank,
  CUME_DIST() OVER (
    PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
  ) AS cume_dist
FROM orders
ORDER BY o_orderpriority, o_totalprice, o_orderkey
"""


@register("window_percent_rank_orders", oracle=_PCTRANK_ORACLE)
def window_percent_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist within priority (rank/(n-1) and
    rank/n are integer ratios → identical doubles)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume_dist"),
        )
        .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
    )


# --------------------------------------------------------------------
# Array-column analytics over embeddings (array min/max/mean + a
# filtered-element count — §2.8 notes the reference has no array ops;
# these are the built-in higher-order functions).
# --------------------------------------------------------------------

_ARRAY_ORACLE = """
SELECT
  vec_id,
  CAST(len(embedding) AS INT) AS dim,
  CAST(list_min(embedding) AS DOUBLE) AS min_val,
  CAST(list_max(embedding) AS DOUBLE) AS max_val,
  list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
              (a, b) -> a + b) / CAST(len(embedding) AS DOUBLE) AS mean_val,
  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
FROM embeddings
ORDER BY vec_id
"""


@register("array_stats_embeddings", oracle=_ARRAY_ORACLE)
def array_stats_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector array statistics via higher-order functions —
    map-only, no explode, no shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    mean_val = (
        F.expr(
            "aggregate(transform(embedding, x -> CAST(x AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        / F.size("embedding").cast("double")
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.array_min("embedding").cast("double").alias("min_val"),
        F.array_max("embedding").cast("double").alias("max_val"),
        mean_val.alias("mean_val"),
        F.expr("size(filter(embedding, x -> x > 0))").cast("long")
        .alias("n_positive"),
    ).orderBy("vec_id")


# --------------------------------------------------------------------
# Q2-shape: correlated scalar MIN subquery — cheapest supplier per
# part (decorrelates to an aggregate + join).
# --------------------------------------------------------------------

_MIN_COST_SQL = """
SELECT
  l.l_partkey,
  CAST(MIN(l.l_extendedprice / l.l_quantity) AS DOUBLE) AS min_unit_price,
  CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers
FROM lineitem l
WHERE CAST(l.l_extendedprice AS DOUBLE) / CAST(l.l_quantity AS DOUBLE) <= (
  SELECT MIN(CAST(l2.l_extendedprice AS DOUBLE) / CAST(l2.l_quantity AS DOUBLE))
  FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey
)
GROUP BY l.l_partkey
ORDER BY l.l_partkey
"""


@register("sql_correlated_min_unit_price", oracle=_MIN_COST_SQL)
def sql_correlated_min_unit_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows achieving the per-part minimum unit price via a correlated
    scalar subquery (TPC-H Q2's min-cost pattern). Same SQL text on
    both engines; Catalyst decorrelates to agg+join."""
    register_views(spark, sf_dir, only=("lineitem",))
    return spark.sql(_MIN_COST_SQL)


# --------------------------------------------------------------------
# Q15-shape: derived revenue view + global-max scalar.
# --------------------------------------------------------------------

_TOP_SUPPLIER_SQL = """
WITH revenue AS (
  SELECT
    l_suppkey AS supplier_no,
    CAST(SUM(CAST(CAST(l_extendedprice AS DOUBLE)
         * (1.0 - CAST(l_discount AS DOUBLE)) AS decimal(27,4))) AS DOUBLE)
      AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


@register("sql_top_revenue_supplier", oracle=_TOP_SUPPLIER_SQL)
def sql_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by quarterly revenue (TPC-H Q15 shape): a derived
    view consumed twice (join + scalar max) — exact-decimal revenue so
    the equality predicate is parity-safe."""
    register_views(spark, sf_dir, only=("lineitem", "supplier"))
    return spark.sql(_TOP_SUPPLIER_SQL)


# --------------------------------------------------------------------
# Q18-shape: HAVING-filtered subquery feeding a join (large orders).
# --------------------------------------------------------------------

_BIG_ORDERS_SQL = """
SELECT
  c.c_custkey,
  o.o_orderkey,
  o.o_orderdate,
  CAST(SUM(CAST(l.l_quantity AS decimal(27,2))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS decimal(27,2))) > 150
)
GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate
ORDER BY total_qty DESC, o.o_orderkey
LIMIT 20
"""


@register("sql_large_quantity_orders", oracle=_BIG_ORDERS_SQL)
def sql_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers' largest orders by total quantity (TPC-H Q18 shape):
    HAVING-filtered IN subquery + 3-way join + top-k. Exact-decimal
    HAVING threshold keeps membership identical across engines."""
    register_views(spark, sf_dir, only=("customer", "orders", "lineitem"))
    return spark.sql(_BIG_ORDERS_SQL)


# --------------------------------------------------------------------
# Q19-shape: disjunctive multi-predicate join (OR of conjunction
# groups over both join sides — the predicate-pushdown stress test).
# --------------------------------------------------------------------

_DISJUNCTIVE_SQL = """
SELECT
  CAST(SUM(CAST(CAST(l.l_extendedprice AS DOUBLE)
       * (1.0 - CAST(l.l_discount AS DOUBLE)) AS decimal(27,4))) AS DOUBLE)
    AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE
  (p.p_brand = 'BRAND#1' AND p.p_size BETWEEN 1 AND 15
   AND l.l_quantity >= 1 AND l.l_quantity <= 21)
  OR
  (p.p_brand = 'BRAND#2' AND p.p_size BETWEEN 10 AND 30
   AND l.l_quantity >= 10 AND l.l_quantity <= 30)
  OR
  (p.p_type = 'PROMO' AND l.l_quantity >= 20)
"""


@register("sql_disjunctive_join_revenue", oracle=_DISJUNCTIVE_SQL)
def sql_disjunctive_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction of conjunctive predicate groups across a join
    (TPC-H Q19 shape). Same SQL both engines; Catalyst extracts the
    common join key and pushes the per-side residuals."""
    register_views(spark, sf_dir, only=("lineitem", "part"))
    return spark.sql(_DISJUNCTIVE_SQL)


# --------------------------------------------------------------------
# Q21-shape: EXISTS + NOT EXISTS against the same table (suppliers
# who were the ONLY late shipper on a multi-supplier order).
# --------------------------------------------------------------------

_MULTI_EXISTS_SQL = """
SELECT
  s.s_name,
  CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
"""


@register("sql_sole_late_shipper", oracle=_MULTI_EXISTS_SQL)
def sql_sole_late_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely responsible for late multi-supplier orders
    (TPC-H Q21 shape): correlated EXISTS and NOT EXISTS over the same
    fact table — the semi+anti join double-decorrelation."""
    register_views(spark, sf_dir, only=("supplier", "lineitem", "orders"))
    return spark.sql(_MULTI_EXISTS_SQL)


# --------------------------------------------------------------------
# Q22-shape: NOT EXISTS + uncorrelated scalar-avg subquery over a
# derived prefix key.
# --------------------------------------------------------------------

_PREFIX_ANTI_SQL = """
WITH wealthy AS (
  SELECT substr(c_name, 10, 1) AS name_digit,
         c_custkey, c_acctbal
  FROM customer
  WHERE CAST(c_acctbal AS DOUBLE) > (
    SELECT CAST(SUM(CAST(c_acctbal AS decimal(27,2))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE)
    FROM customer WHERE CAST(c_acctbal AS DOUBLE) > 0.0
  )
)
SELECT
  w.name_digit,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(SUM(CAST(w.c_acctbal AS decimal(27,2))) AS DOUBLE) AS total_balance
FROM wealthy w
WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = w.c_custkey
)
GROUP BY w.name_digit
ORDER BY w.name_digit
"""


@register("sql_wealthy_inactive_customers", oracle=_PREFIX_ANTI_SQL)
def sql_wealthy_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no orders, grouped by a
    name-derived key (TPC-H Q22 shape): uncorrelated scalar subquery
    + anti join, exact-decimal threshold."""
    register_views(spark, sf_dir, only=("customer", "orders"))
    return spark.sql(_PREFIX_ANTI_SQL)


# --------------------------------------------------------------------
# Q8-shape: share-of-total by year (conditional / total ratio per
# group — nested aggregation).
# --------------------------------------------------------------------

_MARKET_SHARE_SQL = """
WITH allrev AS (
  SELECT
    CAST(year(o.o_orderdate) AS INT) AS order_year,
    n.n_name AS supp_nation,
    CAST(CAST(l.l_extendedprice AS DOUBLE)
         * (1.0 - CAST(l.l_discount AS DOUBLE)) AS decimal(19,4)) AS volume
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
)
SELECT
  order_year,
  CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
       ELSE CAST(0 AS decimal(19,4)) END) AS DOUBLE)
  / CAST(SUM(volume) AS DOUBLE) AS nation_share,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM allrev
GROUP BY order_year
ORDER BY order_year
"""


@register("sql_nation_market_share", oracle=_MARKET_SHARE_SQL)
def sql_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's share of yearly supply revenue (TPC-H Q8 shape):
    conditional-sum / total-sum ratio per year, exact-decimal both."""
    register_views(spark, sf_dir, only=("lineitem", "orders", "supplier", "nation"))
    return spark.sql(_MARKET_SHARE_SQL)


# --------------------------------------------------------------------
# Q10-shape: returned-item losses per customer, top-k.
# --------------------------------------------------------------------

_RETURNS_SQL = """
SELECT
  c.c_custkey,
  c.c_name,
  n.n_name,
  CAST(SUM(CAST(CAST(l.l_extendedprice AS DOUBLE)
       * (1.0 - CAST(l.l_discount AS DOUBLE)) AS decimal(27,4))) AS DOUBLE)
    AS lost_revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY lost_revenue DESC, c.c_custkey
LIMIT 20
"""


@register("sql_top_return_customers", oracle=_RETURNS_SQL)
def sql_top_return_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with the highest returned-item revenue (TPC-H Q10
    shape): 4-way join, filtered agg, deterministic top-k."""
    register_views(spark, sf_dir, only=("customer", "orders", "lineitem", "nation"))
    return spark.sql(_RETURNS_SQL)


# --------------------------------------------------------------------
# UNPIVOT (wide -> long): the inverse of the pivot above. Spark's
# unpivot/melt == SQL UNPIVOT == DuckDB UNPIVOT; long format is the
# profile-friendly shape (one row per (key, metric)).
# --------------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT l_returnflag, metric,
  CAST(SUM(CAST(val AS decimal(27,2))) AS DOUBLE) AS total
FROM (
  UNPIVOT (
    SELECT l_returnflag,
           CAST(l_quantity AS DOUBLE) AS qty,
           CAST(l_extendedprice AS DOUBLE) AS price,
           CAST(l_discount AS DOUBLE) AS discount
    FROM lineitem
  ) ON qty, price, discount INTO NAME metric VALUE val
)
GROUP BY l_returnflag, metric
ORDER BY l_returnflag, metric
"""


@register("unpivot_lineitem_metrics", oracle=_UNPIVOT_ORACLE)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot of three lineitem measures, then per
    (flag, metric) decimal-exact totals.

    Scale notes: unpivot is a map-only row expansion (3x rows, 1/3
    width) feeding a map-side-combinable aggregate — the exchange
    carries only (flag, metric, partial decimal sum).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("qty"),
        F.col("l_extendedprice").cast("double").alias("price"),
        F.col("l_discount").cast("double").alias("discount"),
    )
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["qty", "price", "discount"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return (
        long.groupBy("l_returnflag", "metric")
        .agg(
            F.sum(F.col("val").cast("decimal(27,2)")).cast("double")
            .alias("total")
        )
        .orderBy("l_returnflag", "metric")
    )


# --------------------------------------------------------------------
# Recursive CTE (Spark 4.x WITH RECURSIVE): calendar-spine generation
# + left join so empty months appear as zero rows — the
# fill-the-gaps reporting pattern a plain GROUP BY cannot express.
# --------------------------------------------------------------------

_RECURSIVE_SPINE_SQL = """
WITH RECURSIVE spine(month_start) AS (
  SELECT TIMESTAMP '1995-01-01 00:00:00' AS month_start
  UNION ALL
  SELECT month_start + INTERVAL 1 MONTH FROM spine
  WHERE month_start < TIMESTAMP '2001-12-01 00:00:00'
),
monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS decimal(27,2))) AS DOUBLE)
           AS total_price
  FROM orders GROUP BY 1
)
SELECT
  s.month_start,
  COALESCE(m.n_orders, 0) AS n_orders,
  COALESCE(m.total_price, 0.0) AS total_price
FROM spine s LEFT JOIN monthly m ON s.month_start = m.m
ORDER BY s.month_start
"""


@register("sql_recursive_month_spine", oracle=_RECURSIVE_SPINE_SQL)
def sql_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order counts over a RECURSIVELY generated 84-month
    calendar spine (1995-01..2001-12) — months with zero orders
    surface as explicit zero rows.

    Spark 4's WITH RECURSIVE executes the same text DuckDB runs, so
    the oracle IS the query. Scale notes: the spine is 84 rows
    (driver-side trivial, broadcast into the join); the fact side
    aggregates BEFORE the join, so the spine join touches one row per
    month, not per order.
    """
    register_views(spark, sf_dir, only=("orders",))
    return spark.sql(_RECURSIVE_SPINE_SQL)


# --------------------------------------------------------------------
# LATERAL correlated subquery: per-group top-N where the inner query
# re-executes per outer row — the SQL-standard alternative to a
# ranking window when N is small and the outer side is tiny.
# --------------------------------------------------------------------

_LATERAL_SQL = """
SELECT s.c_mktsegment, t.o_orderkey, t.o_totalprice
FROM (SELECT DISTINCT c_mktsegment FROM customer) s,
LATERAL (
  SELECT o.o_orderkey, o.o_totalprice
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = s.c_mktsegment
  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2
) t
ORDER BY s.c_mktsegment, t.o_totalprice DESC, t.o_orderkey
"""


@register("sql_lateral_top_orders_per_segment", oracle=_LATERAL_SQL)
def sql_lateral_top_orders_per_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-2 orders per market segment via a LATERAL correlated
    subquery (identical text runs on both engines — the oracle IS the
    query; unique tie-breaker inside the correlated LIMIT).

    Scale notes: Catalyst decorrelates the lateral into a join +
    per-group limit; with 5 outer segments the correlated form is
    fine — at high outer cardinality the ranking-window form
    (window_top3_per_supplier) is the scale path.
    """
    register_views(spark, sf_dir, only=("customer", "orders"))
    return spark.sql(_LATERAL_SQL)


# --------------------------------------------------------------------
# CUBE: every subtotal combination of (returnflag, linestatus) with
# explicit grouping markers — the coarse sibling of GROUPING SETS
# above (rollup is the prefix subset of this cube).
# --------------------------------------------------------------------

_CUBE_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT)
    AS grouping_level,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(SUM(CAST(l_extendedprice AS decimal(27,2))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY grouping_level, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@register("sql_cube_revenue", oracle=_CUBE_SQL)
def sql_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE subtotals via the shared-SQL surface (identical text runs
    on both engines; Spark expands the cube into partial-agg grouping
    sets — one scan, map-side combine per set)."""
    register_views(spark, sf_dir, only=("lineitem",))
    return spark.sql(_CUBE_SQL)


# --------------------------------------------------------------------
# Generic as-of join API (the reusable form of
# asof_join_view_before_purchase above, for two DIFFERENT tables).
# --------------------------------------------------------------------

def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
    allow_exact: bool = True,
) -> DataFrame:
    """Point-in-time join: for each left row, attach the payload of
    the latest right row with right_ts <= left_ts (direction
    'backward'; 'forward' = earliest right row >= left_ts), equi-keyed
    on ``on``.

    Spark-first shape — the union + carry-forward pattern: tag the two
    sides, union them, ONE shuffle on the key, and a running
    last(payload, ignorenulls) over the (ts, side) ordering. No range
    join, no per-row probe, no pairwise explosion; cost is a single
    sort-shuffle like any window, whatever the timestamp skew.
    pandas ``merge_asof`` equivalence is property-tested in
    tests/test_asof_api.py.

    Determinism contract: (on, right_ts) pairs must be unique on the
    right side — with several right rows at the same key+timestamp,
    WHICH payload wins is ordering-dependent in every engine
    (pandas included); dedupe first.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    payload = F.struct(*[F.col(c) for c in payload_cols])
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        ).alias("_p"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
        F.lit(None)
        .cast(l_tagged.schema["_row"].dataType)
        .alias("_row"),
    )
    # equal timestamps: with allow_exact the right row must be visible
    # to a same-ts left row -> right sorts first (side 0 < 1) and the
    # frame reaches the current row; without, right sorts after and
    # only strictly-earlier rows are in frame.
    if direction == "backward":
        order = [F.asc("_ts"), F.asc("_side") if allow_exact else F.desc("_side")]
    else:
        order = [F.desc("_ts"), F.asc("_side") if allow_exact else F.desc("_side")]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0 if allow_exact else -1)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_match", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out_cols = [F.col(f"_row.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"_match.{c}").alias(f"asof_{c}") for c in payload_cols
    ]
    return matched.select(*out_cols)


# --------------------------------------------------------------------
# VARIANT ingestion (Spark 4): parse_json into the binary semi-
# structured VARIANT type and extract typed fields with variant_get —
# schema-on-read without declaring a schema up front, the complement
# of json_props_extract_stats' fixed-schema from_json. The oracle
# reproduces the typed extraction with DuckDB's JSON operators.
# --------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT
  CAST(CAST(json_extract(props, '$.k') AS INTEGER) // 10 AS INT)
    AS k_decade,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(CAST(json_extract(props, '$.k') AS INTEGER)
       AS decimal(27,0))) AS DOUBLE) AS sum_k
FROM events
GROUP BY 1
ORDER BY k_decade
"""


@register("variant_props_decade_counts", oracle=_VARIANT_ORACLE)
def variant_props_decade_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of the props.k field by decade bucket, extracted
    through the VARIANT path: parse_json (no schema) + variant_get
    with a type coercion at read site.

    VARIANT keeps the parsed tree in a binary columnar-friendly form,
    so repeated extractions don't re-parse the JSON text — at 100 TB
    the parse cost is paid once per row, not once per field access,
    which is the reason this path exists next to from_json. Bucketing
    and sums are integer/decimal exact.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("cast(variant_get(parse_json(props), '$.k', 'int') as int)")
    return (
        ev.select(k.alias("k"))
        .groupBy(F.expr("cast(k div 10 as int)").alias("k_decade"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("k").cast("decimal(27,0)"))
            .cast("double")
            .alias("sum_k"),
        )
        .orderBy("k_decade")
    )


# --------------------------------------------------------------------
# SQL SCRIPTING (Spark 4 BEGIN..END): procedural control flow — the
# surface a migrating stored-procedure user reaches for. The script
# walks the order years sequentially, folding each year's revenue
# into a halve-and-add accumulator (the decayed-counter recurrence,
# deliberately shared with ts_decayed_popularity): every term is an
# exact dyadic rational whose bits fit the double mantissa, so the
# procedural loop and the oracle's closed-form SUM are bit-identical.
# DuckDB has no scripting dialect, so the oracle is the closed form —
# which is exactly the point: the script's semantics ARE expressible
# as one aggregate, and the engines must agree.
# --------------------------------------------------------------------

_SCRIPTING_SQL = """
BEGIN
  DECLARE y INT;
  DECLARE y_max INT;
  DECLARE acc DOUBLE DEFAULT 0;
  DECLARE yr_cents BIGINT;
  SET y = (SELECT CAST(MIN(YEAR(o_orderdate)) AS INT) FROM orders);
  SET y_max = (SELECT CAST(MAX(YEAR(o_orderdate)) AS INT) FROM orders);
  WHILE y <= y_max DO
    SET yr_cents = (
      SELECT COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18, 2))
                             * 100) AS BIGINT), 0)
      FROM orders WHERE YEAR(o_orderdate) = y
    );
    SET acc = acc / 2 + CAST(yr_cents AS DOUBLE);
    SET y = y + 1;
  END WHILE;
  SELECT CAST(y_max AS BIGINT) AS last_year, acc AS decayed_cents;
END
"""

_SCRIPTING_ORACLE = """
WITH yr AS (
  SELECT YEAR(o_orderdate) AS y,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18, 2)) * 100) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
b AS (SELECT MAX(y) AS y_max FROM yr)
SELECT
  CAST(b.y_max AS BIGINT) AS last_year,
  SUM(CAST(cents AS DOUBLE) / POWER(2, b.y_max - yr.y)) AS decayed_cents
FROM yr CROSS JOIN b
GROUP BY b.y_max
"""


@register("sql_scripting_decayed_revenue", oracle=_SCRIPTING_ORACLE)
def sql_scripting_decayed_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Year-by-year WHILE-loop fold of order revenue into a dyadic
    decayed accumulator, run through Spark's SQL scripting engine.

    The loop is procedural (one scan per year — a scripting surface
    demo, not the scale path; the oracle's single-aggregate closed
    form is what production runs)."""
    register_views(spark, sf_dir, only=("orders",))
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        # materialize: the result frame must outlive the conf scope
        return spark.sql(_SCRIPTING_SQL).localCheckpoint(eager=True)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.scripting.enabled", prev)
        else:
            # conf.get returned None => the key was unset; unset it
            # again or scripting stays enabled on the shared session
            # for every subsequent query.
            spark.conf.unset("spark.sql.scripting.enabled")


# --------------------------------------------------------------------
# Parameterized SQL (named parameter markers): the injection-safe
# templating surface — parameters are bound as literals by the
# parser, not string-spliced. The oracle inlines the same constants.
# --------------------------------------------------------------------

_PARAM_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_totalprice >= :min_price AND YEAR(o_orderdate) = :yr
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

_PARAM_ARGS = {"min_price": 150_000.0, "yr": 1995}

_PARAM_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_totalprice >= 150000.0 AND YEAR(o_orderdate) = 1995
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("sql_params_priority_revenue", oracle=_PARAM_ORACLE)
def sql_params_priority_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """High-value 1995 orders per priority via named parameter
    markers (spark.sql(..., args=...))."""
    register_views(spark, sf_dir, only=("orders",))
    return spark.sql(_PARAM_SQL, args=_PARAM_ARGS)


# --------------------------------------------------------------------
# SQL pipe syntax (Spark 4.x |> operators): the linear relational
# style — each stage names exactly one operation in dataflow order.
# --------------------------------------------------------------------

_PIPE_SQL = """
FROM lineitem
|> WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
   AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
|> EXTEND CAST(CAST(l_extendedprice AS DOUBLE)
     * (1.0 - CAST(l_discount AS DOUBLE)) AS decimal(27,4)) AS disc
|> AGGREGATE SUM(disc) AS rev, COUNT(*) AS n_items
   GROUP BY l_returnflag, l_linestatus
|> WHERE n_items > 10
|> SELECT l_returnflag, l_linestatus, CAST(rev AS DOUBLE) AS revenue,
   CAST(n_items AS BIGINT) AS n_items
|> ORDER BY l_returnflag, l_linestatus
"""

# DuckDB has no pipe parser; the oracle is the semantic twin in plain
# ANSI SQL (same expressions, same HAVING, same order).
_PIPE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(CAST(l_extendedprice AS DOUBLE)
            * (1.0 - CAST(l_discount AS DOUBLE)) AS decimal(27,4)))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
HAVING COUNT(*) > 10
ORDER BY l_returnflag, l_linestatus
"""


@register("sql_pipe_syntax_revenue", oracle=_PIPE_ORACLE)
def sql_pipe_syntax_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly revenue by return flag/line status written in Spark 4's
    SQL pipe syntax (FROM ... |> WHERE |> EXTEND |> AGGREGATE |>
    SELECT |> ORDER BY) — the linear dataflow dialect; the oracle is
    the plain-ANSI twin, so the check proves the pipe program lowers
    to the identical relational plan. Catalyst output is the same
    pushed-filter single-scan aggregate q1 produces."""
    register_views(spark, sf_dir, only=("lineitem",))
    return spark.sql(_PIPE_SQL)


# --------------------------------------------------------------------
# Dynamic SQL (EXECUTE IMMEDIATE + IDENTIFIER): the remaining Spark 4
# dynamic-SQL surface next to scripting / parameter markers / pipe
# syntax — a statement whose TEXT is data, with the table name bound
# through IDENTIFIER() and scalars through USING parameters, so
# neither is string-spliced (injection-safe templating for generated
# per-tenant / per-table jobs). The oracle inlines the same constants
# into plain ANSI.
# --------------------------------------------------------------------

_EXEC_INNER = (
    "SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_orders,"
    " CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18, 2))) AS DOUBLE)"
    " AS total_price"
    " FROM IDENTIFIER(:tbl) o"
    " JOIN customer c ON c.c_custkey = o.o_custkey"
    " JOIN nation n ON n.n_nationkey = c.c_nationkey"
    " JOIN region r ON r.r_regionkey = n.n_regionkey"
    " WHERE r.r_name = :region AND YEAR(o.o_orderdate) = :yr"
    " GROUP BY n.n_name ORDER BY n.n_name"
)

_EXEC_ORACLE = """
SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18, 2))) AS DOUBLE)
         AS total_price
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA' AND YEAR(o.o_orderdate) = 1995
GROUP BY n.n_name ORDER BY n.n_name
"""


@register("sql_execute_immediate_nation_revenue", oracle=_EXEC_ORACLE)
def sql_execute_immediate_nation_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """1995 order count and revenue per ASIA nation, executed as
    DYNAMIC SQL: the statement text is a string value run through
    EXECUTE IMMEDIATE, its table name bound via IDENTIFIER(:tbl) and
    its scalars via USING parameters. Lowered by Catalyst to the
    identical star-join plan the static text produces — the check
    proves the dynamic path adds binding, not different semantics."""
    register_views(
        spark, sf_dir, only=("orders", "customer", "nation", "region")
    )
    stmt = _EXEC_INNER.replace("'", "\\'")
    return spark.sql(
        f"EXECUTE IMMEDIATE '{stmt}'"
        " USING 'orders' AS tbl, 'ASIA' AS region, 1995 AS yr"
    )

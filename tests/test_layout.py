"""Layout scale paths: bucketed join must compile WITHOUT Exchange;
partitioned sink must prune partitions and support dynamic overwrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from workshop3_etl_spark.sources.layout import (
    bucketed_join,
    dynamic_partition_overwrite,
    write_bucketed,
    write_partitioned,
)
from workshop3_etl_spark.sources.tables import load_table


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(orders, "t_orders_b", "o_orderkey", buckets=8)
    write_bucketed(li, "t_lineitem_b", "o_orderkey", buckets=8)

    joined = bucketed_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan

    # co-located result equals the plain (shuffled) join
    expected = orders.join(li, "o_orderkey").count()
    assert joined.count() == expected

    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_partitioned_sink_prunes_and_dynamic_overwrites(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    write_partitioned(ev, path, "event_type")

    back = spark.read.parquet(path)
    one = back.filter(F.col("event_type") == "view")
    scan = one._jdf.queryExecution().executedPlan().toString()
    # partition filter reached the scan (directory pruning, not a
    # post-scan Filter over all files)
    assert "PartitionFilters" in scan and "event_type" in scan.split(
        "PartitionFilters", 1
    )[1][:200], scan
    n_view = one.count()
    assert n_view == ev.filter(F.col("event_type") == "view").count()

    # dynamic overwrite: rewrite ONLY the 'view' partition (halved);
    # sibling partitions must survive untouched
    half = (
        ev.filter(F.col("event_type") == "view")
        .filter(F.col("event_id") % 2 == 0)
    )
    with dynamic_partition_overwrite(spark):
        write_partitioned(half, path, "event_type")
    after = spark.read.parquet(path)
    assert after.filter(F.col("event_type") == "view").count() == half.count()
    assert (
        after.filter(F.col("event_type") != "view").count()
        == ev.filter(F.col("event_type") != "view").count()
    )

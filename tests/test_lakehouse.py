"""Layout management: partition pruning and write shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from workshop3_etl_spark.sources.lakehouse import lineitem_partitioned_by_year
from workshop3_etl_spark.sources.tables import load_table


def test_partitioned_write_prunes(spark, tmp_path):
    part = lineitem_partitioned_by_year(spark, SF_SMOKE, str(tmp_path / "li"))
    # correctness: same rows, partition column attached
    base = load_table(spark, SF_SMOKE, "lineitem")
    assert part.count() == base.count()
    # pruning: a ship_year filter must reach the scan as a partition
    # filter, not a data filter
    q = part.filter(F.col("ship_year") == 1995)
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert "ship_year" in plan.split("PartitionFilters:")[1].split("\n")[0]
    # and the result matches the unpartitioned computation
    expected = base.filter(F.year("l_shipdate") == 1995).count()
    assert q.count() == expected


def test_partition_directories_on_disk(spark, tmp_path):
    lineitem_partitioned_by_year(spark, SF_SMOKE, str(tmp_path / "li"))
    years = sorted(
        p.name for p in (tmp_path / "li").iterdir() if p.name.startswith("ship_year=")
    )
    assert len(years) >= 2  # hive-style layout materialized


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Tables bucketed on the join key join WITHOUT an exchange —
    the co-located-join layout for recurring fact-fact joins."""
    import uuid

    from workshop3_etl_spark.sources.lakehouse import write_bucketed
    from workshop3_etl_spark.sources.tables import load_table

    suffix = uuid.uuid4().hex[:8]
    t_orders, t_li = f"b_orders_{suffix}", f"b_lineitem_{suffix}"
    write_bucketed(
        load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice"),
        t_orders, "o_orderkey", n_buckets=8,
    )
    write_bucketed(
        load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity"),
        t_li, "l_orderkey", n_buckets=8,
    )
    try:
        # disable broadcast so the join strategy decision is about
        # shuffle-vs-bucket, not size
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(t_li).join(
            spark.table(t_orders),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        # bucketed-on-key scan feeds the join without re-hashing
        assert "Exchange hashpartitioning" not in plan
        # and the join result is correct
        n = joined.count()
        expected = (
            load_table(spark, SF_SMOKE, "lineitem")
            .join(
                load_table(spark, SF_SMOKE, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n == expected
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")


def test_dynamic_partition_overwrite_touches_only_incoming(spark, tmp_path):
    """Dynamic overwrite rewrites ONLY the partitions present in the
    incoming frame; sibling partitions survive byte-for-byte."""
    from workshop3_etl_spark.sources.lakehouse import (
        dynamic_partition_overwrite,
        write_partitioned,
    )

    path = str(tmp_path / "ev")
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    write_partitioned(ev, path, ["event_type"])

    half = ev.filter(
        (F.col("event_type") == "view") & (F.col("event_id") % 2 == 0)
    )
    with dynamic_partition_overwrite(spark):
        write_partitioned(half, path, ["event_type"])

    after = spark.read.parquet(path)
    assert after.filter(F.col("event_type") == "view").count() == half.count()
    assert (
        after.filter(F.col("event_type") != "view").count()
        == ev.filter(F.col("event_type") != "view").count()
    )


def test_zorder_key_roundtrip_and_locality(spark):
    """Morton key property: deinterleaving the key recovers both
    inputs exactly (bijectivity on 16-bit pairs)."""
    import random

    from pyspark.sql import functions as F

    from workshop3_etl_spark.sources.lakehouse import _Z_BITS, zorder_key

    rng = random.Random(7)
    pts = [(rng.randrange(1 << _Z_BITS), rng.randrange(1 << _Z_BITS))
           for _ in range(500)]
    df = spark.createDataFrame(pts, "x long, y long").select(
        "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
    )
    # reconstruct x (even bits) and y (odd bits) in plain Python
    for row in df.collect():
        x = y = 0
        for i in range(_Z_BITS):
            x |= ((row["z"] >> (2 * i)) & 1) << i
            y |= ((row["z"] >> (2 * i + 1)) & 1) << i
        assert (x, y) == (row["x"], row["y"])


def test_jsonl_sink_source_roundtrip(spark, tmp_path):
    """JSON-lines sink/source leg: documents written as JSONL and read
    back with an explicit schema are content-identical (same rows,
    same values — the same serialize/parse contract the Kafka leg
    uses, on files). Schema-on-read: the reader is given the schema
    explicitly, as a production pipeline should (inference costs an
    extra pass and can widen types)."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_CORRECT
    from workshop3_etl_spark.sources.tables import load_table

    docs = load_table(spark, SF_CORRECT, "documents")
    path = str(tmp_path / "docs_jsonl")
    docs.write.mode("overwrite").json(path)
    back = spark.read.schema(docs.schema).json(path)

    assert back.count() == docs.count()
    fp = lambda df: {  # noqa: E731
        r["fp"]
        for r in df.select(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("doc_id").cast("string"),
                    F.col("lang"),
                    F.col("source"),
                    F.col("text"),
                )
            ).alias("fp")
        ).collect()
    }
    assert fp(back) == fp(docs)


def test_registered_colocated_join_plan_is_shuffle_free(spark, tmp_path):
    """lakehouse_bucketed_colocated_join's own join frame (built via
    the SAME shared helpers the registered query uses) must be a
    SortMergeJoin with NO exchange on either join key — the property
    the operator exists for. The only exchange allowed in the plan is
    the final per-priority aggregation."""
    import re
    import uuid

    from workshop3_etl_spark.sources.lakehouse import (
        colocated_join_agg,
        write_bucketed_fact_tables,
    )

    suffix = uuid.uuid4().hex[:8]
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    t_li = t_orders = None
    try:
        t_li, t_orders = write_bucketed_fact_tables(
            spark, SF_SMOKE, str(tmp_path), suffix
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        frame = colocated_join_agg(spark, t_li, t_orders)
        plan = frame._sc._jvm.PythonSQLUtils.explainString(
            frame._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        # no shuffle on either join key: every hashpartitioning in the
        # plan is the final priority aggregation, never the orderkeys
        for seg in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
            assert "orderkey" not in seg, plan
        # and the values equal the raw-table join (layout only)
        got = {r["priority"]: tuple(r)[1:] for r in frame.collect()}
        from workshop3_etl_spark.functions import metrics as M

        raw = (
            load_table(spark, SF_SMOKE, "lineitem")
            .join(
                load_table(spark, SF_SMOKE, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_items"),
                M.dsum("l_quantity", "total_qty"),
                M.dsum("l_extendedprice", "total_price"),
            )
        )
        exp = {r["priority"]: tuple(r)[1:] for r in raw.collect()}
        assert got == exp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in (t_orders, t_li):
            if t:
                spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_zonemap_advisor_both_verdicts_are_real(spark):
    """The advisor only means something if the two layouts actually
    diverge on this corpus: the range-partitioned layout must prune
    most files for the one-month predicate while the hash layout
    scans every file — and both must agree on the true match count
    (pruning never changes results, only bytes read)."""
    from workshop3_etl_spark.sources.lakehouse import _ZM_FILES

    from workshop3_etl_spark.plans.registry import get

    rows = {
        r["layout"]: r
        for r in get("layout_zonemap_prune_stats")
        .fn(spark, SF_SMOKE)
        .collect()
    }
    rng, hsh = rows["range_partitioned"], rows["hash_partitioned"]
    assert hsh["n_files_scanned"] == _ZM_FILES  # no pruning possible
    assert hsh["scan_fraction"] == 1.0
    assert rng["n_files_scanned"] <= 4  # zone maps prune the rest
    assert 0.0 < rng["scan_fraction"] < 0.2
    assert rng["n_rows_matching"] == hsh["n_rows_matching"] > 0
    # every matching row lives in a scanned file
    assert rng["n_rows_scanned"] >= rng["n_rows_matching"]


def test_bucket_pruning_on_equality_filter(spark, tmp_path):
    """An equality filter on the bucket column must prune the scan to
    ONE bucket (SelectedBucketsCount 1 out of 8) — the read-side
    payoff of bucketing beyond shuffle-free joins: a point lookup
    touches 1/8 of the files."""
    import uuid

    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.sources.lakehouse import write_bucketed
    from workshop3_etl_spark.sources.tables import load_table

    name = f"orders_bp_{uuid.uuid4().hex[:8]}"
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    # autoBucketedScan drops the bucketed layout when no join/agg
    # needs the distribution — but bucket PRUNING rides the bucketed
    # scan, so a point-lookup workload pins it on.
    auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(auto)
    try:
        spark.conf.set(auto, "false")
        write_bucketed(
            o, name, "o_orderkey", n_buckets=8,
            path=str(tmp_path / name),
        )
        key = o.limit(1).collect()[0]["o_orderkey"]
        q = spark.table(name).filter(F.col("o_orderkey") == int(key))
        plan = q._sc._jvm.PythonSQLUtils.explainString(
            q._jdf.queryExecution(), "formatted"
        )
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert q.count() >= 1
    finally:
        spark.conf.set(auto, prev)
        spark.sql(f"DROP TABLE IF EXISTS {name}")

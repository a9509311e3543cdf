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

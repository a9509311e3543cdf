"""Storage-layout scale paths: bucketed tables (exchange-free joins)
and partitioned sinks (partition-pruned scans, dynamic overwrite).

Why this module exists: at 100 TB the dominant cost of a fact-fact
join is the shuffle. Bucketing both tables on the join key at WRITE
time moves that shuffle out of every query and into the (one-time)
ingest: Spark records bucket spec in the catalog, and a join of two
tables bucketed on the same key with the same bucket count compiles
to a SortMergeJoin with NO Exchange on either side. Likewise,
``partitionBy`` at write time turns predicate filters on the
partition column into directory pruning — the scan never opens
non-matching files.

These are WRITE-path operators, so they register no `queries()` entry
(the correctness driver is read-only over the shared testdata);
tests/test_layout.py drives them end-to-end and asserts the plan
properties (no Exchange; PartitionFilters present) that make them
worth having.

Reference parity: the reference persists results to Postgres tables
and SQLite (`kafka/consumer.py:77-92`, `src/etl.py`); bucketing /
partition layout is the lakehouse-native equivalent of its indexed
tables, part of the scale extension.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 32,
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table.

    Bucket count is part of the co-location contract: every table that
    wants exchange-free joins against this one must use the SAME
    ``buckets`` and key. 32 matches the test harness; production picks
    buckets so each bucket file lands in the 128MB-1GB range.
    """
    keys = [key] if isinstance(key, str) else key
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left: str, right: str, key: str | list[str]
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.

    With matching bucket specs Catalyst plans SortMergeJoin with zero
    Exchange operators (asserted in tests/test_layout.py); the sortBy
    at write time also removes the per-task Sort.
    """
    keys = [key] if isinstance(key, str) else key
    return spark.table(left).join(spark.table(right), on=keys)


@contextmanager
def dynamic_partition_overwrite(spark: SparkSession):
    """Scope ``partitionOverwriteMode=dynamic``: INSERT OVERWRITE
    replaces only the partitions present in the incoming frame —
    idempotent backfill of one day/type without touching siblings."""
    conf = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf, "static")
    spark.conf.set(conf, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(conf, prev)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: str | list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet sink (``path/col=value/...``).

    Filters on ``partition_cols`` become directory pruning at read
    time (PartitionFilters in the scan node, zero data files opened
    for non-matching values). Combine with
    ``dynamic_partition_overwrite`` for partition-scoped idempotent
    rewrites.
    """
    cols = [partition_cols] if isinstance(partition_cols, str) else partition_cols
    df.write.mode(mode).partitionBy(*cols).parquet(path)

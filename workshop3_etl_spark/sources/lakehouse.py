"""Partitioned/bucketed table layout management.

The reference's only layout decision is "one CSV per year" — which is
manual partition pruning (`src/etl.py:104-105` reads only requested
years; SURVEY §4). This module is the engine's real version: write
datasets partitioned by a derived key so Catalyst prunes partitions,
and optionally bucketed so co-keyed joins skip the shuffle.

At 100 TB layout IS the query plan: a `ship_year`-partitioned
lineitem turns every year-ranged query from a full scan into a
directory listing; bucketing orders+lineitem by orderkey turns the
fact-fact join into a zip of co-located buckets.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    target_file_rows: int | None = None,
) -> None:
    """Write parquet partitioned by ``partition_cols``.

    Repartitioning by the partition columns first means each task
    writes whole partitions (no small-file explosion of
    tasks x partitions files).
    """
    out = df.repartition(*[F.col(c) for c in partition_cols])
    out.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed managed table (bucket pruning + shuffle-free
    joins between tables bucketed the same way)."""
    writer = df.write.bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.mode(mode).format("parquet").saveAsTable(table_name)


def lineitem_partitioned_by_year(
    spark: SparkSession, sf_dir: str, out_path: str
) -> DataFrame:
    """Materialize lineitem partitioned by ship year; returns the
    reloaded partitioned frame (year-ranged filters now prune)."""
    from workshop3_etl_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate").cast("int")
    )
    write_partitioned(li, out_path, ["ship_year"])
    return spark.read.parquet(out_path)


@contextmanager
def dynamic_partition_overwrite(spark: SparkSession):
    """Scope ``partitionOverwriteMode=dynamic``: INSERT OVERWRITE then
    replaces ONLY the partitions present in the incoming frame — the
    idempotent backfill shape (rewrite one day/type without touching
    siblings)."""
    conf = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf, "static")
    spark.conf.set(conf, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(conf, prev)

"""JDBC analytics surface (S5/S7 — `README.md:300-311`,
`Reporte_Tecnico.md:545-585`): expose the warehouse table to BI tools
and read it back into Spark.

No JDBC driver jars ship in this environment, so these are thin,
import-safe builders exercised only when a driver/URL exists; the
same table shape is covered end-to-end through the SQLite sink in
tests. On a cluster, point ``url`` at Postgres
(``jdbc:postgresql://...``) with the standard driver on the
executor classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_table_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 1000,
    properties: dict[str, str] | None = None,
) -> None:
    """Plain JDBC append (no upsert — Spark's JDBC writer can't; for
    merge semantics use streaming/upsert.py's foreachBatch). The
    ``batchsize`` option is the JDBC twin of the reference's
    ``execute_batch(page_size=…)`` (`kafka/consumer.py:182`)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    writer = writer.option("batchsize", str(batchsize))
    for key, value in (properties or {}).items():
        writer = writer.option(key, value)
    writer.mode(mode).save()


def read_table_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC scan. Always pass ``partition_column`` (a numeric
    key) for any non-trivial table — without it the whole table reads
    through one connection on one task."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        bounds = (
            spark.read.format("jdbc")
            .option("url", url)
            .option(
                "dbtable",
                f"(SELECT MIN({partition_column}) lo, MAX({partition_column}) hi"
                f" FROM {table}) b",
            )
            .load()
            .collect()[0]
        )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(bounds["lo"]))
            .option("upperBound", str(bounds["hi"]))
            .option("numPartitions", str(num_partitions))
        )
    for key, value in (properties or {}).items():
        reader = reader.option(key, value)
    return reader.load()

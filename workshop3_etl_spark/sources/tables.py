"""Parquet star-schema loaders for the driver testdata (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings. All loads are plain ``spark.read.parquet`` so
Catalyst gets full pushdown/pruning; no schema inference cost (parquet
footers carry the schema).

At cluster scale the same API points at an object-store prefix; nothing
here assumes local files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# factor (region=5 rows, nation=25 rows at every SF; supplier/part grow
# slowly). Joins against these should always be broadcast-hash.
BROADCAST_DIMS = ("region", "nation", "supplier")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts is TIMESTAMP(NANOS) in the parquet footer; Spark reads it
        # as a nanos long (session.py sets nanosAsLong). Truncate to
        # micros — the same conversion DuckDB applies — so downstream
        # timestamp semantics agree across engines.
        from pyspark.sql import functions as F

        # integer div — float division would lose precision on ns
        # epochs (~1.7e18 > 2^53).
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries can
    name them exactly as the DuckDB oracle does."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

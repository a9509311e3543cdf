"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
an Arrow-backed parquet reader with explicit partition planning and
filter pushdown — the engine's demonstration of the V2 extensibility
surface a connector author would use for a format Spark doesn't ship
(proprietary archives, object-store manifests, feature-store APIs).

What it exercises, deliberately end-to-end:

- **partition planning**: ``partitions()`` splits the file into row
  ranges, so the scan parallelizes across executors (a production
  source maps these to row groups / byte ranges / shards instead of
  slices of a small file);
- **Arrow batch transfer**: ``read()`` yields ``RecordBatch`` objects,
  not per-row tuples, so rows never individually cross the
  Python/JVM boundary.

Scale notes: each partition opens the file independently inside
``read()`` (no driver-side data movement). Column pruning is not part
of the Python DS reader API as of Spark 4.1 — Spark projects after the
scan. Filter pushdown (``pushFilters``) is deliberately NOT
implemented: Spark 4.1 caches ONE reader instance inside the scan
relation shared by every action on a DataFrame, and ``pushFilters`` is
only invoked by queries that have filters — so pushed-filter state
from one action leaks into a later filterless action on the same
DataFrame (verified empirically: filtered count then plain count
returned the filtered rowcount twice). Until the reader lifecycle is
per-query, a mutating pushFilters is a correctness hazard, and Spark
re-applying filters post-scan is the safe default.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

FORMAT_NAME = "ws_arrow_parquet"


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int  # exclusive


class ArrowParquetReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.n_splits = int(options.get("splits", "8"))

    def partitions(self):
        import pyarrow.parquet as pq

        n_rows = pq.ParquetFile(self.path).metadata.num_rows
        n = max(1, self.n_splits)
        step = max(1, -(-n_rows // n))
        return [
            _RangePartition(s, min(s + step, n_rows))
            for s in range(0, n_rows, step)
        ]

    def read(self, partition):
        import pyarrow.parquet as pq

        # Opened per partition on the executor. The testdata file has
        # one row group, so each task reads it and slices its row
        # range; a multi-row-group layout would map partitions onto
        # row groups and read only those.
        table = pq.read_table(self.path)
        table = table.slice(
            partition.start, partition.end - partition.start
        )
        yield from table.to_batches()


class ArrowParquetDataSource(DataSource):
    @classmethod
    def name(cls):
        return FORMAT_NAME

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(
            pq.read_schema(self.options["path"])
        )

    def reader(self, schema):
        return ArrowParquetReader(self.options)


def register_format(spark: SparkSession) -> None:
    """Idempotently register the format with the session."""
    spark.dataSource.register(ArrowParquetDataSource)


# --------------------------------------------------------------------
# Registry query through the custom source: same aggregate as a native
# read would produce, hash-compared — proving the Python DS path is a
# drop-in scan, not a demo.
# --------------------------------------------------------------------

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from workshop3_etl_spark.plans.registry import register  # noqa: E402

_PYDS_ORACLE = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


@register("pyds_documents_by_lang", oracle=_PYDS_ORACLE)
def pyds_documents_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc counts/char totals scanned through the custom
    Arrow-backed Python DataSource (4 planned row-range partitions)."""
    register_format(spark)
    df = (
        spark.read.format(FORMAT_NAME)
        .option("path", f"{sf_dir}/documents.parquet")
        .option("splits", "4")
        .load()
    )
    return (
        df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )

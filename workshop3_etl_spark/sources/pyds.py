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
    SimpleDataSourceStreamReader,
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


# --------------------------------------------------------------------
# Python STREAMING data source (SimpleDataSourceStreamReader): a
# replayable "document feed" that serves documents.parquet in
# row-offset chunks with explicit offset management — the API surface
# for wrapping a paginated upstream (HTTP feed, queue, vendor API) as
# a Structured Streaming source with exactly-once semantics:
#
# - offsets are plain dicts ({"row": k}) checkpointed by Spark;
# - read(start) serves [start, start+chunk) and returns the next
#   offset — a restarted query resumes from the checkpoint, not the
#   initial offset;
# - readBetweenOffsets(start, end) re-serves a batch bit-identically
#   during failure recovery (deterministic replay is on the SOURCE in
#   this contract).
#
# The Simple reader variant runs on the driver (no partition
# planning) — the right trade for a low-rate feed; a high-volume
# source implements DataSourceStreamReader with partitions() instead
# (same planning surface as the batch reader above).
# --------------------------------------------------------------------

STREAM_FORMAT_NAME = "ws_document_feed"


class _DocumentFeedStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options["path"]
        self.chunk = int(options.get("chunk", "200"))
        self._table = None

    def _rows(self, start: int, end: int):
        import pyarrow.parquet as pq

        if self._table is None:
            self._table = pq.read_table(self.path)
        sl = self._table.slice(start, end - start)
        return iter(sl.to_pandas().itertuples(index=False, name=None))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).metadata.num_rows
        lo = start["row"]
        hi = min(lo + self.chunk, n)
        return self._rows(lo, hi), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["row"], end["row"])

    def commit(self, end: dict) -> None:
        pass  # nothing to acknowledge upstream in a file-backed feed


class DocumentFeedDataSource(DataSource):
    @classmethod
    def name(cls):
        return STREAM_FORMAT_NAME

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(pq.read_schema(self.options["path"]))

    def simpleStreamReader(self, schema):
        return _DocumentFeedStreamReader(self.options)


def register_stream_format(spark: SparkSession) -> None:
    """Idempotently register the streaming feed format."""
    spark.dataSource.register(DocumentFeedDataSource)


_FEED_ORACLE = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY lang
ORDER BY lang
"""


@register("stream_pyds_feed_by_lang", oracle=_FEED_ORACLE)
def stream_pyds_feed_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language counts after streaming the corpus through the
    Python feed source in offset chunks — the streamed union must
    equal the batch table exactly (exactly-once offset contract)."""
    import tempfile
    import time

    register_stream_format(spark)
    path = f"{sf_dir}/documents.parquet"
    n_total = spark.read.parquet(path).count()
    sink = f"pyds_feed_{abs(hash(sf_dir)) % 10_000_000}"
    stream = (
        spark.readStream.format(STREAM_FORMAT_NAME)
        .option("path", path)
        # several micro-batches at every SF without unbounded batch
        # count: ~4 chunks
        .option("chunk", str(max(200, -(-n_total // 4))))
        .load()
    )
    with tempfile.TemporaryDirectory() as ck:
        q = (
            stream.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + 120
        while (
            time.time() < deadline and spark.table(sink).count() < n_total
        ):
            time.sleep(0.25)
        q.stop()
        q.awaitTermination()
        # A timeout must surface as an error, never as a silently
        # partial per-lang count.
        n_sunk = spark.table(sink).count()
        if n_sunk != n_total:
            raise TimeoutError(
                f"pyds feed drained {n_sunk}/{n_total} rows before the "
                "120s deadline — failing instead of returning a "
                "partial aggregate"
            )
        return (
            spark.table(sink)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("lang")
            .localCheckpoint(eager=True)
        )

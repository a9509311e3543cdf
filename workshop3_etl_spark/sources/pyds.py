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
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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

from workshop3_etl_spark.functions import canon  # noqa: E402
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
            q.isActive
            and time.time() < deadline
            and spark.table(sink).count() < n_total
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


# --------------------------------------------------------------------
# Python DataSource WRITER (the third V2 surface next to the batch and
# stream readers): a JSONL-shard sink with a two-phase commit — each
# task writes its shard and returns a WriterCommitMessage; the driver
# commits by atomically publishing a manifest (the same
# tmp-write + os.replace idiom as streaming/compaction.py). A reader
# that trusts only manifest-listed shards gets all-or-nothing
# visibility: a failed job leaves no manifest, so its orphan shards
# are invisible. abort() best-effort-removes orphans, but Spark 4.1's
# batch write exec does NOT invoke it on task failure (verified
# empirically) — which is exactly why readers must resolve files via
# the manifest, never by globbing the directory.
#
# Scale notes: in local mode every task sees one filesystem; on a
# cluster the path must be shared storage (the manifest protocol is
# what object-store committers do). Tasks stage ATTEMPT-unique
# `_pending-*` files and publish NOTHING; commit() renames the
# winning attempts to job-token-unique final shards, so concurrent
# attempts (retry/speculation) never share a file, failed jobs leave
# only invisible staged orphans, and prior committed generations are
# untouched until the manifest atomically changes hands.
# --------------------------------------------------------------------

WRITER_FORMAT_NAME = "ws_jsonl_manifest"

# 60-bit per-row content hash, carried as four 15-bit limb sums and
# folded to one int64-safe value (functions/canon.py): an order- and
# partitioning-independent content checksum shared by the writer, the
# Spark readback, and the oracle. Limb sums (plain integer sums) are
# the ASSOCIATIVE merge — shard partials add elementwise into a
# manifest total — while the folded checksum stays within int64 (the
# official driver cannot round-trip >64-bit decimals; the old raw
# 60-bit-hash sum was exactly that).
_ROW_HASH_PREFIX = canon.FP_HEX_DIGITS


def _row_checksum(doc_id: int, text: str) -> int:
    import hashlib

    h = hashlib.md5(f"{doc_id}:{text}".encode("utf-8")).hexdigest()
    return int(h[:_ROW_HASH_PREFIX], 16)


@dataclass
class _ShardCommit(WriterCommitMessage):
    shard: str
    n_rows: int
    h_sums: tuple  # four 15-bit limb sums (canon.fp_limbs order)


def _write_jsonl_shard(path: str, iterator) -> tuple:
    """Serialize rows to a staged JSONL file; returns (n_rows,
    h_sums). Shared by the batch and streaming sinks so the wire
    format and the checksum cannot drift between them."""
    import json

    n = 0
    sums = (0, 0, 0, 0)
    with open(path, "w", encoding="utf-8") as f:
        for row in iterator:
            f.write(
                json.dumps(
                    {
                        "doc_id": row.doc_id,
                        "lang": row.lang,
                        "text": row.text,
                    },
                    ensure_ascii=False,
                    sort_keys=True,
                )
                + "\n"
            )
            sums = canon.fp_add_limbs(
                sums, canon.fp_limbs(_row_checksum(row.doc_id, row.text))
            )
            n += 1
    return n, sums


def _stage_name(token: str, pid: int) -> str:
    """Attempt-unique staging name: two live attempts of one task
    (retry or speculation) must never share a file, so the TASK
    ATTEMPT id is part of the name; only commit() maps the winning
    attempt's file to a stable final name."""
    import os

    from pyspark import TaskContext

    attempt = TaskContext.get().taskAttemptId()
    return f"_pending-{token}-{pid:05d}-{attempt}"


class JsonlManifestWriter(DataSourceWriter):
    """DataSourceWriter with true all-or-nothing visibility: tasks
    only STAGE `_pending-*` files; commit() renames the winning
    attempts to job-token-unique final shards and atomically
    publishes the manifest. Nothing a failed job wrote is ever
    reachable through a manifest, and a previously committed dataset
    in the same directory is untouched until the new manifest
    replaces the old one.

    Save modes: overwrite=True replaces the manifest (and best-effort
    deletes the superseded generation's shards — readers holding the
    old manifest get a grace window, the compaction GC discipline);
    overwrite=False (append) MERGES the existing manifest's shard
    list with the new job's (shard names are job-token-unique, so
    generations never clobber each other)."""

    def __init__(self, options, overwrite):
        import uuid

        self.path = options["path"]
        self.overwrite = overwrite
        # driver-generated, pickled to every task: one token per job
        self.token = uuid.uuid4().hex[:8]

    def write(self, iterator):
        import os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        staged = _stage_name(self.token, pid)
        n, chk = _write_jsonl_shard(
            os.path.join(self.path, staged), iterator
        )
        return _ShardCommit(f"{staged}|{pid}", n, chk)

    def commit(self, messages):
        import json
        import os

        shards = []
        for m in messages:
            staged, pid = m.shard.split("|")
            final = f"shard-{self.token}-{int(pid):05d}.jsonl"
            os.replace(
                os.path.join(self.path, staged),
                os.path.join(self.path, final),
            )
            shards.append(
                {"shard": final, "n_rows": m.n_rows,
                 "h_sums": list(m.h_sums),
                 "checksum": str(canon.fp_fold(m.h_sums))}
            )
        mpath = os.path.join(self.path, "manifest.json")
        prev = None
        if os.path.exists(mpath):
            with open(mpath, encoding="utf-8") as f:
                prev = json.load(f)
        if prev is not None and not self.overwrite:
            # manifest format check BEFORE merging: a pre-limb-fold
            # manifest (checksum only, no per-shard 'h_sums') cannot
            # be merged associatively — fail with the remedy instead
            # of a KeyError deep in the fold
            legacy = [
                s["shard"] for s in prev["shards"] if "h_sums" not in s
            ]
            if legacy:
                raise ValueError(
                    "manifest.json at "
                    f"{self.path!r} has {len(legacy)} shard(s) from a "
                    "pre-'h_sums' format (e.g. "
                    f"{legacy[0]!r}); append-mode merge needs per-"
                    "shard limb sums. Rewrite the dataset with "
                    "mode='overwrite' to migrate the manifest."
                )
            shards = prev["shards"] + shards
        # associative merge: limb sums add across shards, fold once
        total = (0, 0, 0, 0)
        for s in shards:
            total = canon.fp_add_limbs(total, s["h_sums"])
        manifest = {
            "shards": sorted(shards, key=lambda s: s["shard"]),
            "total_rows": sum(s["n_rows"] for s in shards),
            "checksum": str(canon.fp_fold(total)),
        }
        tmp = os.path.join(self.path, f"_pending-{self.token}-manifest")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        if prev is not None and self.overwrite:
            # superseded generation: best-effort GC after the commit
            for s in prev["shards"]:
                try:
                    os.remove(os.path.join(self.path, s["shard"]))
                except OSError:
                    pass

    def abort(self, messages):
        import glob
        import os

        # nothing was published; drop this job's staged files
        for p in glob.glob(
            os.path.join(self.path, f"_pending-{self.token}-*")
        ):
            try:
                os.remove(p)
            except OSError:
                pass


class JsonlManifestDataSource(DataSource):
    @classmethod
    def name(cls):
        return WRITER_FORMAT_NAME

    def writer(self, schema, overwrite):
        return JsonlManifestWriter(self.options, overwrite)


def register_writer_format(spark: SparkSession) -> None:
    """Idempotently register the sink format with the session."""
    spark.dataSource.register(JsonlManifestDataSource)


_WRITER_SHARDS = 4

_WRITER_ORACLE = f"""
WITH hh AS (
  SELECT {canon.fp_hash_duck("CAST(doc_id AS VARCHAR) || ':' || text")} AS h
  FROM documents
)
SELECT CAST({_WRITER_SHARDS} AS BIGINT) AS n_shards,
       CAST(COUNT(*) AS BIGINT) AS manifest_rows,
       CAST(COUNT(*) AS BIGINT) AS read_rows,
       {canon.fp_fold_agg_sql('h')} AS checksum,
       TRUE AS manifest_match
FROM hh
"""


@register("pyds_writer_manifest_roundtrip", oracle=_WRITER_ORACLE)
def pyds_writer_manifest_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Write documents through the custom two-phase-commit JSONL sink,
    then read the shards back natively and verify the manifest: shard
    count, row totals, and the order-independent 60-bit content
    checksum — recomputed BY SPARK SQL over the readback (limb-fold,
    functions/canon.py) and compared against the manifest's
    python-int fold (and against the oracle's DuckDB fold over the
    source table). A mismatch anywhere —
    writer-side hashing, manifest arithmetic, JSONL round-trip
    fidelity (ensure_ascii=False), readback parsing — fails the hash
    compare, so the whole writer protocol is inside the correctness
    gate, not just demonstrated.
    """
    import json
    import os
    import shutil
    import tempfile

    from workshop3_etl_spark.sources.tables import load_table

    register_writer_format(spark)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .repartition(_WRITER_SHARDS, "doc_id")
    )
    outdir = tempfile.mkdtemp(prefix="ws_jsonl_manifest_")
    try:
        docs.write.format(WRITER_FORMAT_NAME).mode("append").save(outdir)
        with open(os.path.join(outdir, "manifest.json"), encoding="utf-8") as f:
            manifest = json.load(f)
        # resolve files via the manifest, NOT a glob — orphan shards
        # from failed earlier jobs are invisible to manifest readers
        shard_paths = [
            os.path.join(outdir, s["shard"]) for s in manifest["shards"]
        ]
        readback = spark.read.schema(
            "doc_id long, lang string, text string"
        ).json(shard_paths)
        h = canon.fp_hash_spark(
            "concat(cast(doc_id as string), ':', text)"
        )
        agg = readback.selectExpr(f"{h} as h").agg(
            F.lit(len(manifest["shards"])).cast("long").alias("n_shards"),
            F.lit(int(manifest["total_rows"])).cast("long").alias(
                "manifest_rows"
            ),
            F.count(F.lit(1)).cast("long").alias("read_rows"),
            F.expr(canon.fp_fold_agg_sql("h")).alias("checksum"),
        ).select(
            "n_shards",
            "manifest_rows",
            "read_rows",
            "checksum",
            (
                F.col("checksum").cast("string")
                == F.lit(manifest["checksum"])
            ).alias("manifest_match"),
        )
        return agg.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(outdir, ignore_errors=True)


# --------------------------------------------------------------------
# Python DataSource STREAMING writer — the fourth and last V2 surface:
# per-micro-batch two-phase commit onto epoch-numbered manifests (the
# engine's epoch-overwrite replay protocol expressed through the
# public sink API). Tasks stage `_pending-{partition}` files (safe:
# micro-batches are serial, partition ids unique within one);
# commit(messages, batchId) renames them to
# `epoch={batchId}-shard-{partition}.jsonl` and atomically replaces
# `manifest-epoch-{batchId}.json`. A replayed batch — crash before OR
# after the sink commit — re-stages and re-commits the SAME epoch
# files with identical content, so delivery is effectively-once for
# any reader that resolves shards via the epoch manifests.
# --------------------------------------------------------------------

STREAM_WRITER_FORMAT_NAME = "ws_jsonl_epochs"


class JsonlEpochStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        import uuid

        self.path = options["path"]
        # per-QUERY token (driver-generated, pickled to tasks): abort()
        # may only clean THIS query's staged files — a shared
        # "_pending-s-*" glob would delete a concurrent writer's
        # staged shards in the same directory.
        self.token = f"s{uuid.uuid4().hex[:8]}"

    def write(self, iterator):
        import os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        staged = _stage_name(self.token, pid)
        n, chk = _write_jsonl_shard(
            os.path.join(self.path, staged), iterator
        )
        return _ShardCommit(f"{staged}|{pid}", n, chk)

    def commit(self, messages, batchId):
        import json
        import os

        shards = []
        for m in messages:
            if m is None:
                continue
            staged, pid = m.shard.split("|")
            final = f"epoch={batchId}-shard-{int(pid):05d}.jsonl"
            os.replace(
                os.path.join(self.path, staged),
                os.path.join(self.path, final),
            )
            shards.append(
                {"shard": final, "n_rows": m.n_rows,
                 "h_sums": list(m.h_sums),
                 "checksum": str(canon.fp_fold(m.h_sums))}
            )
        manifest = {
            "batch_id": batchId,
            "shards": sorted(shards, key=lambda s: s["shard"]),
            "total_rows": sum(s["n_rows"] for s in shards),
        }
        tmp = os.path.join(self.path, f"_tmp-manifest-{batchId}")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f)
        os.replace(
            tmp, os.path.join(self.path, f"manifest-epoch-{batchId}.json")
        )

    def abort(self, messages, batchId):
        import glob
        import os

        # scoped to THIS query's token: concurrent writers sharing the
        # directory keep their staged files (their own commit/abort
        # owns them); orphans from crashed foreign writers stay on
        # disk but are invisible to manifest readers.
        for p in glob.glob(
            os.path.join(self.path, f"_pending-{self.token}-*")
        ):
            try:
                os.remove(p)
            except OSError:
                pass


class JsonlEpochSinkDataSource(DataSource):
    @classmethod
    def name(cls):
        return STREAM_WRITER_FORMAT_NAME

    def streamWriter(self, schema, overwrite):
        return JsonlEpochStreamWriter(self.options)


def register_stream_writer_format(spark: SparkSession) -> None:
    """Idempotently register the streaming sink format."""
    spark.dataSource.register(JsonlEpochSinkDataSource)


def read_epoch_sink(spark: SparkSession, path: str) -> DataFrame:
    """Read back a JsonlEpochStreamWriter directory: only shards
    listed by committed epoch manifests are visible (orphan _pending
    files from failed batches are not)."""
    import glob
    import json
    import os

    schema = "doc_id long, lang string, text string"
    shard_paths = []
    for mp in sorted(glob.glob(os.path.join(path, "manifest-epoch-*.json"))):
        with open(mp, encoding="utf-8") as f:
            man = json.load(f)
        shard_paths.extend(
            os.path.join(path, s["shard"]) for s in man["shards"]
        )
    if not shard_paths:  # no committed epoch yet (reader racing writer)
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(shard_paths)


@register("stream_pyds_sink_by_lang", oracle=_FEED_ORACLE)
def stream_pyds_sink_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full custom-connector pipeline: documents streamed through
    the PYTHON stream source (offset chunks) into the PYTHON stream
    sink (epoch-manifest two-phase commit), then read back via the
    epoch manifests and aggregated per language — hash-equal to the
    batch table, which proves exactly-once through BOTH custom
    surfaces composed."""
    import os
    import tempfile

    register_stream_format(spark)
    register_stream_writer_format(spark)
    path = f"{sf_dir}/documents.parquet"
    n_total = spark.read.parquet(path).count()
    stream = (
        spark.readStream.format(STREAM_FORMAT_NAME)
        .option("path", path)
        .option("chunk", str(max(200, -(-n_total // 4))))
        .load()
        .select("doc_id", "lang", "text")
    )
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "sink")
        os.makedirs(out)
        ck = os.path.join(tmp, "ck")
        q = (
            stream.writeStream.format(STREAM_WRITER_FORMAT_NAME)
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        # the simple stream reader feeds one offset chunk per batch;
        # poll the committed-epoch total until the corpus drains
        import time

        deadline = time.time() + 120
        while (
            q.isActive
            and time.time() < deadline
            and read_epoch_sink(spark, out).count() < n_total
        ):
            time.sleep(0.25)
        q.stop()
        q.awaitTermination()
        got = read_epoch_sink(spark, out)
        n_sunk = got.count()
        if n_sunk != n_total:
            raise TimeoutError(
                f"epoch sink holds {n_sunk}/{n_total} rows — failing "
                "instead of returning a partial aggregate"
            )
        return (
            got.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
            .orderBy("lang")
            .localCheckpoint(eager=True)
        )

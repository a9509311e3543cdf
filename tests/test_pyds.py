"""Custom Python DataSource: the Arrow-backed scan must be a drop-in
replacement for the native parquet read, with real partition
planning."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from workshop3_etl_spark.sources.pyds import FORMAT_NAME, register_format


def _load(spark, splits):
    register_format(spark)
    return (
        spark.read.format(FORMAT_NAME)
        .option("path", f"{SF_SMOKE}/documents.parquet")
        .option("splits", str(splits))
        .load()
    )


def test_pyds_rows_match_native_read(spark):
    via_pyds = {tuple(r) for r in _load(spark, 4).collect()}
    native = {
        tuple(r)
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    assert via_pyds == native


def test_pyds_partition_planning(spark):
    df = _load(spark, 4)
    assert df.rdd.getNumPartitions() == 4
    # single-split still covers every row
    assert _load(spark, 1).count() == df.count()


def test_pyds_post_scan_filter_is_correct(spark):
    """Filters are applied by Spark after the scan (pushFilters is
    deliberately unimplemented — see the module docstring); both
    orders of filtered/unfiltered actions must be consistent."""
    df = _load(spark, 4)
    n_en = df.filter(df.lang == "en").count()
    n_all = df.count()
    assert 0 < n_en < n_all


def _feed_stream(spark, chunk):
    from workshop3_etl_spark.sources.pyds import (
        STREAM_FORMAT_NAME,
        register_stream_format,
    )

    register_stream_format(spark)
    return (
        spark.readStream.format(STREAM_FORMAT_NAME)
        .option("path", f"{SF_SMOKE}/documents.parquet")
        .option("chunk", "150")
        .load()
    )


def _run_until(spark, query, table, target, timeout=120):
    import time

    deadline = time.time() + timeout
    while time.time() < deadline and spark.table(table).count() < target:
        time.sleep(0.5)
    query.stop()
    query.awaitTermination()


def test_document_feed_streams_in_offset_chunks(spark, tmp_path):
    """The Python streaming source must deliver the whole table in
    chunk-sized micro-batches, exactly once."""
    q = (
        _feed_stream(spark, 150)
        .writeStream.format("memory")
        .queryName("feed_all")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    _run_until(spark, q, "feed_all", 500)
    got = {tuple(r) for r in spark.table("feed_all").collect()}
    native = {
        tuple(r)
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    assert got == native
    assert spark.table("feed_all").count() == len(native)  # no dups
    sizes = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"]]
    assert max(sizes) <= 150 and sum(sizes) == len(native)


def test_document_feed_restart_resumes_from_checkpoint(spark, tmp_path):
    """Stop mid-feed, restart with the same checkpoint: the source
    must resume from the committed offset — total coverage with no
    duplicates and no gaps. (File sink: the memory sink does not
    support checkpoint recovery.)"""
    import time

    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    # availableNow snapshots ONE read() chunk for a Simple stream
    # reader — a deterministic "killed after the first batch" run
    q1 = (
        _feed_stream(spark, 150)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination()
    n_first = spark.read.parquet(out).count()
    assert 0 < n_first < 500

    q2 = (
        _feed_stream(spark, 150)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline and spark.read.parquet(out).count() < 500:
        time.sleep(0.5)
    q2.stop()
    q2.awaitTermination()

    final = spark.read.parquet(out)
    native = {
        tuple(r)
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    assert final.count() == len(native)  # exactly once: no dups, no gaps
    assert {tuple(r) for r in final.collect()} == native


def test_writer_commit_publishes_manifest_atomically(spark, tmp_path):
    """A successful write publishes shards + manifest whose totals and
    checksum match a direct recompute; shard files are complete JSONL."""
    import json
    import os

    from workshop3_etl_spark.functions import canon
    from workshop3_etl_spark.sources.pyds import (
        WRITER_FORMAT_NAME,
        _row_checksum,
        register_writer_format,
    )

    register_writer_format(spark)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "lang", "text")
        .repartition(3, "doc_id")
    )
    docs.write.format(WRITER_FORMAT_NAME).mode("append").save(out)
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    rows = docs.collect()
    assert manifest["total_rows"] == len(rows)
    sums = (0, 0, 0, 0)
    for r in rows:
        sums = canon.fp_add_limbs(
            sums, canon.fp_limbs(_row_checksum(r["doc_id"], r["text"]))
        )
    assert int(manifest["checksum"]) == canon.fp_fold(sums)
    assert 0 <= int(manifest["checksum"]) < canon.FP_PRIME  # int64-safe
    assert len(manifest["shards"]) == 3
    n_lines = 0
    for s in manifest["shards"]:
        p = os.path.join(out, s["shard"])
        with open(p, encoding="utf-8") as f:
            lines = [json.loads(ln) for ln in f]
        assert len(lines) == s["n_rows"]
        n_lines += len(lines)
    assert n_lines == len(rows)
    assert not [p for p in os.listdir(out) if p.startswith("_pending-")]


def test_writer_failure_leaves_no_manifest_and_retry_supersedes(
    spark, tmp_path
):
    """The manifest is the correctness boundary: a failed write leaves
    NO manifest and NO final shards (tasks only stage `_pending-*`
    files, and Spark 4.1 does not invoke abort() on task failure, so
    staged orphans MAY remain — invisible to manifest readers), and a
    subsequent successful write to the same directory publishes a
    manifest whose listed shards reproduce the source exactly."""
    import os

    import pytest

    from pyspark.sql import functions as F

    from workshop3_etl_spark.sources.pyds import (
        WRITER_FORMAT_NAME,
        register_writer_format,
    )

    register_writer_format(spark)
    out = str(tmp_path / "sink_abort")
    os.makedirs(out)
    base = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "lang", "text")
        .repartition(3, "doc_id")
    )
    poisoned = base.withColumn(
        "text",
        F.when(
            F.col("doc_id") == 0, F.raise_error(F.lit("poisoned row"))
        ).otherwise(F.col("text")),
    )
    with pytest.raises(Exception):
        poisoned.write.format(WRITER_FORMAT_NAME).mode("append").save(out)
    left = os.listdir(out)
    assert "manifest.json" not in left  # nothing is visible
    # retry: a clean write to the SAME dir supersedes orphans by
    # idempotent shard naming; manifest readers get exact content
    import json

    base.write.format(WRITER_FORMAT_NAME).mode("append").save(out)
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["total_rows"] == base.count()
    shard_paths = [os.path.join(out, s["shard"]) for s in manifest["shards"]]
    readback = spark.read.schema("doc_id long, lang string, text string").json(
        shard_paths
    )
    assert sorted(
        (r["doc_id"], r["text"]) for r in readback.collect()
    ) == sorted((r["doc_id"], r["text"]) for r in base.collect())


def test_stream_sink_commit_is_replay_idempotent(spark, tmp_path):
    """Re-staging and re-committing the SAME batch id (what a
    crash-replay does, whether the crash hit before or after the sink
    commit) must leave identical epoch files — and the epoch reader
    must ignore uncommitted _pending orphans."""
    import json
    import os

    from workshop3_etl_spark.sources.pyds import (
        JsonlEpochStreamWriter,
        _row_checksum,
        read_epoch_sink,
    )

    out = str(tmp_path / "epoch_sink")
    os.makedirs(out)
    w = JsonlEpochStreamWriter({"path": out})
    rows = [(1, "en", "alpha"), (2, "de", "beta")]

    def stage(pid, rws, attempt=0):
        pending = os.path.join(out, f"_pending-s-{pid:05d}-{attempt}")
        with open(pending, "w", encoding="utf-8") as f:
            for doc_id, lang, text in rws:
                f.write(
                    json.dumps(
                        {"doc_id": doc_id, "lang": lang, "text": text},
                        ensure_ascii=False,
                        sort_keys=True,
                    )
                    + "\n"
                )
        from workshop3_etl_spark.functions import canon
        from workshop3_etl_spark.sources.pyds import _ShardCommit

        sums = (0, 0, 0, 0)
        for d, _, t in rws:
            sums = canon.fp_add_limbs(
                sums, canon.fp_limbs(_row_checksum(d, t))
            )
        return _ShardCommit(
            f"_pending-s-{pid:05d}-{attempt}|{pid}",
            len(rws),
            sums,
        )

    m = stage(0, rows)
    w.commit([m], batchId=7)
    first = {
        p: open(os.path.join(out, p)).read()
        for p in os.listdir(out)
    }
    # replay: stage (a fresh attempt) + commit the same batch again
    m2 = stage(0, rows, attempt=1)
    w.commit([m2], batchId=7)
    second = {
        p: open(os.path.join(out, p)).read()
        for p in os.listdir(out)
    }
    assert first == second  # byte-identical epoch state
    # an uncommitted orphan from a failed later batch is invisible
    stage(0, [(99, "xx", "orphan")])
    visible = {r["doc_id"] for r in read_epoch_sink(spark, out).collect()}
    assert visible == {1, 2}


def test_writer_append_accumulates_and_overwrite_replaces(spark, tmp_path):
    """mode('append') merges generations (job-token shard names never
    clobber); mode('overwrite') replaces the manifest and GCs the
    superseded generation's shards."""
    import json
    import os

    from workshop3_etl_spark.sources.pyds import (
        WRITER_FORMAT_NAME,
        register_writer_format,
    )

    register_writer_format(spark)
    out = str(tmp_path / "modes")
    os.makedirs(out)
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "lang", "text")
        .repartition(2, "doc_id")
    )
    half = docs.where("doc_id % 2 = 0")
    rest = docs.where("doc_id % 2 = 1")
    half.write.format(WRITER_FORMAT_NAME).mode("append").save(out)
    rest.write.format(WRITER_FORMAT_NAME).mode("append").save(out)
    man = json.load(open(os.path.join(out, "manifest.json")))
    assert man["total_rows"] == docs.count()  # both generations visible
    assert len(man["shards"]) == 4
    for s in man["shards"]:  # every listed shard exists on disk
        assert os.path.exists(os.path.join(out, s["shard"]))
    # overwrite: only the new generation remains listed AND on disk
    half.write.format(WRITER_FORMAT_NAME).mode("overwrite").save(out)
    man2 = json.load(open(os.path.join(out, "manifest.json")))
    assert man2["total_rows"] == half.count()
    assert len(man2["shards"]) == 2
    on_disk = {p for p in os.listdir(out) if p.startswith("shard-")}
    assert on_disk == {s["shard"] for s in man2["shards"]}


def test_writer_append_rejects_legacy_manifest_clearly(spark, tmp_path):
    """A manifest written by the pre-'h_sums' format (checksum only)
    cannot be merged associatively; append mode must fail with a
    format-version error naming the remedy, not a KeyError."""
    import json
    import os

    import pytest

    from workshop3_etl_spark.sources.pyds import (
        WRITER_FORMAT_NAME,
        register_writer_format,
    )

    register_writer_format(spark)
    out = str(tmp_path / "legacy")
    os.makedirs(out)
    legacy = {
        "shards": [
            {"shard": "shard-old-00000.jsonl", "n_rows": 1,
             "checksum": "123"}
        ],
        "total_rows": 1,
        "checksum": "123",
    }
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump(legacy, f)
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "lang", "text")
        .limit(3)
    )
    with pytest.raises(Exception) as ei:
        docs.write.format(WRITER_FORMAT_NAME).mode("append").save(out)
    msg = str(ei.value)
    assert "h_sums" in msg and "overwrite" in msg
    # overwrite mode migrates the dataset past the legacy manifest
    docs.write.format(WRITER_FORMAT_NAME).mode("overwrite").save(out)
    man = json.load(open(os.path.join(out, "manifest.json")))
    assert man["total_rows"] == 3
    assert all("h_sums" in s for s in man["shards"])


def test_stream_sink_abort_is_scoped_to_own_query(tmp_path):
    """Two streaming queries writing to the SAME directory: one
    query's abort() must remove only ITS OWN staged files — the
    pre-fix glob ('_pending-s-*') deleted the concurrent writer's
    staged shards, losing the other micro-batch's data."""
    import os

    from workshop3_etl_spark.sources.pyds import JsonlEpochStreamWriter

    out = str(tmp_path / "shared_sink")
    os.makedirs(out)
    wa = JsonlEpochStreamWriter({"path": out})
    wb = JsonlEpochStreamWriter({"path": out})
    assert wa.token != wb.token  # per-query uuid tokens

    a_staged = os.path.join(out, f"_pending-{wa.token}-00000-0")
    b_staged = os.path.join(out, f"_pending-{wb.token}-00000-0")
    for p in (a_staged, b_staged):
        with open(p, "w", encoding="utf-8") as f:
            f.write('{"doc_id": 1, "lang": "en", "text": "t"}\n')

    wb.abort([], batchId=3)
    assert os.path.exists(a_staged), "abort deleted a foreign query's shard"
    assert not os.path.exists(b_staged), "abort left its own staged file"

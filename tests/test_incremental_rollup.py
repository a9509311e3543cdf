"""Incremental rollup maintenance: multi-micro-batch streaming merge
must equal the batch recompute, and untouched partitions must not be
rewritten."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from workshop3_etl_spark.sources.tables import load_table
from workshop3_etl_spark.streaming.rollup import maintain_rollup


def test_incremental_rollup_equals_batch(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    # two files -> two micro-batches (maxFilesPerTrigger=1), with
    # overlapping days so the merge path (read-modify-write) runs
    src = str(tmp_path / "src")
    ev.filter(F.col("event_id") % 2 == 0).repartition(1).write.parquet(
        f"{src}/part_a"
    )
    ev.filter(F.col("event_id") % 2 == 1).repartition(1).write.parquet(
        f"{src}/part_b"
    )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    rollup = str(tmp_path / "rollup")
    maintain_rollup(spark, stream, rollup, str(tmp_path / "ckpt"))

    got = (
        spark.read.parquet(rollup)
        # partition column comes back last; normalize order
        .select("day", "event_type", "n_events", "value_cents")
        .orderBy("day", "event_type")
        .collect()
    )
    exp = (
        ev.select(
            F.to_date("ts").alias("day"),
            "event_type",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").cast("long").alias("value_cents"),
        )
        .orderBy("day", "event_type")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]
    # day-partitioned layout on disk (partition pruning at query time)
    assert any(
        name.startswith("day=") for name in os.listdir(rollup)
    )

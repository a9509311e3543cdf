"""Incremental materialized rollup: a streaming foreachBatch that
maintains a day-partitioned aggregate table so the rollup is always
queryable without rescanning the fact stream — the engine's
hypertable-continuous-aggregate shape.

Per micro-batch: aggregate the batch, read ONLY the rollup partitions
the batch touches, merge (associative sums in integer cents — exact
under any merge order), and dynamic-partition-overwrite just those
partitions. Untouched days are never read or written, so maintenance
cost tracks the batch's time locality, not the table's history — the
property that makes this viable when the rollup spans years at 100 TB.

The merge is idempotent per micro-batch REPLAY only if the batch's
contribution is first subtracted or the write is transactional; with
the parquet sink used here, exactly-once comes from the availableNow +
checkpoint contract (a replayed batch rewrites the same merged
partitions from the same inputs). A lakehouse MERGE (see
streaming/upsert.staged_merge_batch) is the transactional upgrade.

Reference parity: the reference maintains running per-country
aggregates in a process-local dict (`kafka/consumer.py:123-151`);
this is that operator made durable, partition-pruned, and restartable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_COLS = ("day", "event_type", "n_events", "value_cents")


def _batch_rollup(batch: DataFrame) -> DataFrame:
    return (
        batch.select(
            F.to_date("ts").alias("day"),
            "event_type",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("value_cents"),
        )
    )


def merge_rollup_batch(
    spark: SparkSession, batch: DataFrame, rollup_path: str
) -> None:
    """foreachBatch body: merge one micro-batch into the rollup."""
    from workshop3_etl_spark.sources.lakehouse import (
        dynamic_partition_overwrite,
    )

    b = _batch_rollup(batch)
    days = [r.day for r in b.select("day").distinct().collect()]
    if not days:
        return
    try:
        existing = spark.read.parquet(rollup_path).filter(
            F.col("day").isin(days)
        )
        merged = (
            existing.select(*ROLLUP_COLS)
            .unionByName(b.select(*ROLLUP_COLS))
            .groupBy("day", "event_type")
            .agg(
                F.sum("n_events").cast("long").alias("n_events"),
                F.sum("value_cents").cast("long").alias("value_cents"),
            )
        )
    except Exception:  # first batch: rollup table doesn't exist yet
        merged = b
    # materialize BEFORE the overwrite — the plan reads the same
    # partitions it is about to replace
    out = merged.localCheckpoint(eager=True)
    with dynamic_partition_overwrite(spark):
        out.write.mode("overwrite").partitionBy("day").parquet(rollup_path)


def maintain_rollup(
    spark: SparkSession,
    events_stream: DataFrame,
    rollup_path: str,
    checkpoint_dir: str,
) -> None:
    """Run the incremental maintenance to completion (availableNow)."""
    (
        events_stream.writeStream.foreachBatch(
            lambda b, _epoch: merge_rollup_batch(spark, b, rollup_path)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

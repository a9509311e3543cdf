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

    # the batch frame lives on a CLONED SparkSession; scope the
    # dynamic-overwrite conf (and the index read) to that session, or
    # the write runs static and wipes untouched partitions
    spark = batch.sparkSession
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


# --------------------------------------------------------------------
# Incremental DECAYED counters: the streaming realization of
# operators/timeseries.ts_decayed_popularity (that query is this
# job's batch oracle). State per event_type: (last_day, n_events,
# score_scaled) where score_scaled is the EXACT integer
# sum(2^(HORIZON - age)) relative to last_day. Aging one day is an
# arithmetic right-shift — every live contribution is an even power
# of two (halves exactly) and a contribution at exactly age HORIZON
# holds value 1 (shifts to 0 = the horizon cut). So shift-then-add
# reproduces the batch query bit-for-bit under ANY micro-batch
# arrival order, including out-of-event-time-order batches (both the
# state and the batch aggregate shift forward to the max day seen).
# --------------------------------------------------------------------

from workshop3_etl_spark.operators.timeseries import _DECAY_HORIZON_DAYS

COUNTER_COLS = ("event_type", "last_day", "n_events", "score_scaled")


def _batch_decay(batch: DataFrame) -> DataFrame:
    """Aggregate one micro-batch to per-type scaled decay sums
    relative to the batch's own max day."""
    mx = batch.agg(F.max(F.date_trunc("day", "ts")).cast("date").alias("md"))
    d = batch.crossJoin(F.broadcast(mx)).select(
        "event_type",
        "md",
        F.datediff(
            F.col("md"), F.date_trunc("day", "ts").cast("date")
        ).alias("age"),
    )
    w = F.when(
        F.col("age") <= _DECAY_HORIZON_DAYS,
        F.expr(
            f"shiftleft(cast(1 as bigint), {_DECAY_HORIZON_DAYS} - age)"
        ),
    ).otherwise(F.lit(0).cast("long"))
    return d.groupBy("event_type").agg(
        F.max("md").alias("last_day"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(w).cast("long").alias("score_scaled"),
    )


def merge_decayed_batch(
    spark: SparkSession, batch: DataFrame, state_path: str
) -> None:
    """foreachBatch body: shift existing counters forward to the new
    max day and add the batch's contribution.

    The state table is one row per counter key — small by contract —
    so a whole-table overwrite is the right write shape here; a
    high-cardinality key set would swap in the partitioned MERGE from
    streaming/upsert.staged_merge_batch instead.
    """
    spark = batch.sparkSession
    b = _batch_decay(batch)
    try:
        state = spark.read.parquet(state_path).select(*COUNTER_COLS)
        u = state.unionByName(b.select(*COUNTER_COLS))
    except Exception:  # first batch: no state yet
        u = b.select(*COUNTER_COLS)
    md = u.agg(F.max("last_day").alias("md"))
    shifted = u.crossJoin(F.broadcast(md)).select(
        "event_type",
        F.col("md").alias("last_day"),
        "n_events",
        # JVM shift amounts wrap at 64 — clamp explicitly (score is
        # < 2^62, so >= 63 days of aging always zeroes it).
        F.expr(
            "CASE WHEN datediff(md, last_day) >= 63 THEN CAST(0 AS BIGINT)"
            " ELSE shiftright(score_scaled, datediff(md, last_day)) END"
        ).alias("score_scaled"),
    )
    merged = shifted.groupBy("event_type").agg(
        F.max("last_day").alias("last_day"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("score_scaled").cast("long").alias("score_scaled"),
    )
    out = merged.localCheckpoint(eager=True)
    out.write.mode("overwrite").parquet(state_path)


def maintain_decayed_counters(
    spark: SparkSession,
    events_stream: DataFrame,
    state_path: str,
    checkpoint_dir: str,
) -> None:
    """Run decayed-counter maintenance to completion (availableNow)."""
    (
        events_stream.writeStream.foreachBatch(
            lambda b, _epoch: merge_decayed_batch(spark, b, state_path)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_decayed_counters(spark: SparkSession, state_path: str) -> DataFrame:
    """Query surface over the counter state: the same columns
    ts_decayed_popularity returns."""
    return (
        spark.read.parquet(state_path)
        .select(
            "event_type",
            "n_events",
            (
                F.col("score_scaled").cast("double")
                / F.lit(2.0 ** _DECAY_HORIZON_DAYS)
            ).alias("decayed_count"),
        )
        .orderBy("event_type")
    )

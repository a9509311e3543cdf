"""The full stream-scoring topology (SURVEY §3.3) as one composition:

    message stream → parse(schema) → model.transform (whole
    micro-batch) → foreachBatch { idempotent upsert } ( + optional
    per-key online metrics)

This is the reference consumer (`kafka/consumer.py:191-274`) as
Structured Streaming: per-message predict becomes vectorized
micro-batch scoring, the process-local metrics dict becomes the
checkpointed stateful operator, the 200-message buffer becomes the
micro-batch itself, and the UNIQUE-key upsert carries over as the
effectively-once guarantee.

The source is pluggable (Kafka via sources/kafka_io, or any
DataFrame stream) so tests drive the identical topology with a file
source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from workshop3_etl_spark.schema import WAREHOUSE_COLS
from workshop3_etl_spark.streaming.upsert import (
    partitioned_sqlite_upsert_batch,
    sqlite_upsert_batch,
    staged_merge_batch,
)

_SINKS = {
    "driver": sqlite_upsert_batch,
    "partitioned": partitioned_sqlite_upsert_batch,
    "merge": staged_merge_batch,
}


def score_and_upsert_stream(
    messages: DataFrame,
    model,
    db_path: str,
    checkpoint_dir: str,
    page_size: int = 100,
    sink: str = "partitioned",
) -> StreamingQuery:
    """Attach scoring + warehouse upsert to a parsed message stream.

    ``messages`` must carry the canonical happiness columns +
    is_train/is_test (the A5 message shape). Scoring happens INSIDE
    foreachBatch via ``model.transform`` on the whole micro-batch —
    the vectorized replacement for the reference's one-row predict
    (`kafka/consumer.py:162-165`).

    ``sink`` picks the merge path: "partitioned" (default —
    executor-side per-partition upsert), "merge" (staged lakehouse
    MERGE), or "driver" (collect + single connection; single-writer
    demo only).
    """
    upsert = _SINKS[sink]

    def _process(batch: DataFrame, epoch_id: int) -> None:
        scored = model.transform(batch)
        sel = [F.col(src).alias(dst) for src, dst in WAREHOUSE_COLS.items()]
        sel += [
            F.col("is_train"),
            F.col("is_test"),
            F.col("prediction").alias("y_pred"),
        ]
        upsert(db_path, scored.select(*sel), page_size)

    return (
        messages.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

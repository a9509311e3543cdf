"""Kafka JSON source/sink builders (S2/S3 — the reference's
producer/consumer pair re-expressed as Structured Streaming).

No broker (or spark-sql-kafka package) exists in this environment, so
these builders are import-safe and only touch Kafka when invoked; the
identical transformations are covered by the file-source streaming
queries (streaming/batch_equivalent.py) and the fixture tests.

Reference parity:
- producer: one JSON object per row (`kafka/producer.py:91-106`) →
  here one ``to_json(struct(...))`` column written in a single job —
  no per-row loop, no ``iterrows``.
- consumer: earliest offsets + auto-commit (`kafka/consumer.py:
  206-213`) → checkpointed readStream (offsets in the checkpoint, the
  streaming-native consumer group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from workshop3_etl_spark.schema import MESSAGE_SCHEMA


def to_kafka_messages(df: DataFrame) -> DataFrame:
    """Serialize rows to the reference's message shape
    (FIXTURES.md A5): flat JSON, one message per row."""
    return df.select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    )


def write_batch_to_kafka(df: DataFrame, bootstrap: str, topic: str) -> None:
    """Batch produce (the producer entry point, `kafka/producer.py:59`)."""
    (
        to_kafka_messages(df)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )


def read_stream_from_kafka(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    schema: T.StructType = MESSAGE_SCHEMA,
) -> DataFrame:
    """Checkpointable JSON stream (the consumer entry point,
    `kafka/consumer.py:191-213`)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("m")
    ).select("m.*")


def parse_json_messages(df: DataFrame, schema: T.StructType = MESSAGE_SCHEMA) -> DataFrame:
    """The from_json leg alone (testable without a broker): df must
    have a string ``value`` column; malformed fields coerce to NULL —
    the same to_float()->None tolerance as `kafka/consumer.py:
    116-120`."""
    return df.select(
        F.from_json(F.col("value").cast("string"), schema).alias("m")
    ).select("m.*")

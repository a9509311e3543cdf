"""Broker-backed Kafka end-to-end: producer → topic → readStream →
scored upsert — the reference's full topology (`kafka/producer.py:
59-117` → `kafka/consumer.py:191-274`) over a REAL broker.

No broker (or spark-sql-kafka jar) ships in this sandbox, so the test
SKIPS unless a broker answers at $KAFKA_BOOTSTRAP (default
localhost:9092). The moment one exists — e.g. `spark-submit --packages
org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>` against a
dev broker — this lights up with zero code changes; every leg it
composes (serialize, parse, score, idempotent upsert, replay) is
already covered broker-less by tests/test_streaming.py.
"""

from __future__ import annotations

import os
import socket
import sqlite3
import uuid

import pytest

KAFKA_BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP", "localhost:9092")


def _broker_reachable(bootstrap: str = KAFKA_BOOTSTRAP) -> bool:
    host, _, port = bootstrap.rpartition(":")
    try:
        with socket.create_connection((host or "localhost", int(port)), timeout=2):
            return True
    except OSError:
        return False


pytestmark = pytest.mark.skipif(
    not _broker_reachable(), reason=f"no Kafka broker at {KAFKA_BOOTSTRAP}"
)


def test_kafka_roundtrip_scoring_topology(spark, tmp_path):
    """Produce the happiness rows to a fresh topic, stream-consume
    them, score + upsert into the warehouse, and verify count plus
    replay idempotence — the reference topology end-to-end."""
    from workshop3_etl_spark.ml import build_linreg_pipeline, with_split_flags
    from workshop3_etl_spark.schema import FEATURES, MESSAGE_SCHEMA, TARGET
    from workshop3_etl_spark.sources.happiness import clean, load_unified
    from workshop3_etl_spark.sources.kafka_io import (
        read_stream_from_kafka,
        write_batch_to_kafka,
    )
    from workshop3_etl_spark.streaming.pipeline import score_and_upsert_stream

    fixtures = os.path.join(os.path.dirname(__file__), "fixtures", "happiness")
    paths = {y: os.path.join(fixtures, f"{y}.csv") for y in range(2015, 2020)}
    data = with_split_flags(clean(load_unified(spark, paths)), ["Country", "Year"])
    model = build_linreg_pipeline(FEATURES, TARGET).fit(data.filter("is_train = 1"))

    topic = f"happiness-{uuid.uuid4().hex[:12]}"
    write_batch_to_kafka(data, KAFKA_BOOTSTRAP, topic)

    db = str(tmp_path / "warehouse.sqlite")

    def run(ckpt: str) -> None:
        messages = read_stream_from_kafka(
            spark, KAFKA_BOOTSTRAP, topic, MESSAGE_SCHEMA
        )
        q = score_and_upsert_stream(messages, model, db, str(tmp_path / ckpt))
        q.awaitTermination()

    run("ckpt1")
    con = sqlite3.connect(db)
    n1 = con.execute("SELECT COUNT(*) FROM predictions").fetchone()[0]
    assert n1 == data.count()
    # replay from scratch offsets (fresh checkpoint = new consumer
    # group at earliest) → same warehouse state, no duplicates
    run("ckpt2")
    n2 = con.execute("SELECT COUNT(*) FROM predictions").fetchone()[0]
    n_unscored = con.execute(
        "SELECT COUNT(*) FROM predictions WHERE y_pred IS NULL"
    ).fetchone()[0]
    con.close()
    assert n2 == n1
    assert n_unscored == 0

"""Idempotent upsert sink for Structured Streaming (S4/J1).

The reference's consumer buffers 200 messages then
``INSERT … ON CONFLICT (country,year,is_train,is_test) DO UPDATE``
(`kafka/consumer.py:77-106,167-189`). Spark's JDBC writer has no
upsert, so the standard pattern is a ``foreachBatch`` body that
performs the merge — which also upgrades the delivery guarantee:
at-least-once micro-batches + key-idempotent merge = effectively-once
end-to-end (`SURVEY §2.9`).

Two backends:
- SQLite (stdlib; used by tests and the local demo — mirrors the
  reference's SQLite variant, `scripts/peek_sqlite.py`).
- Any JDBC URL via the same SQL, for a real Postgres
  (`jdbc_upsert_sql`); at cluster scale prefer a lakehouse
  ``MERGE INTO`` keyed on the same columns.

Partition behavior: each micro-batch DataFrame is coalesced and
written by the driver for SQLite (single-writer database); the JDBC
path writes per-partition connections with batched statements
(``executemany`` page-size semantics like the reference's
``execute_batch(page_size=100)``).
"""

from __future__ import annotations

import sqlite3
from collections.abc import Callable

from pyspark.sql import DataFrame

PREDICTIONS_DDL = """
CREATE TABLE IF NOT EXISTS predictions (
    country  TEXT NOT NULL,
    year     INTEGER NOT NULL,
    gdp      REAL, social REAL, health REAL, freedom REAL, corrupt REAL,
    y_true   REAL,
    is_train INTEGER,
    is_test  INTEGER,
    y_pred   REAL,
    UNIQUE (country, year, is_train, is_test)
)
"""

_UPSERT_SQL = """
INSERT INTO predictions
  (country, year, gdp, social, health, freedom, corrupt,
   y_true, is_train, is_test, y_pred)
VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)
ON CONFLICT (country, year, is_train, is_test) DO UPDATE SET
  gdp = excluded.gdp, social = excluded.social, health = excluded.health,
  freedom = excluded.freedom, corrupt = excluded.corrupt,
  y_true = excluded.y_true, y_pred = excluded.y_pred
"""

_COLS = [
    "country", "year", "gdp", "social", "health", "freedom", "corrupt",
    "y_true", "is_train", "is_test", "y_pred",
]


def sqlite_upsert_batch(db_path: str, batch: DataFrame, page_size: int = 100) -> int:
    """Merge one micro-batch into SQLite; returns rows upserted.

    Replays are safe: the UNIQUE key makes re-processing a batch a
    no-op update (`README.md:245`'s replay guarantee).
    """
    rows = [tuple(r[c] for c in _COLS) for r in batch.select(*_COLS).collect()]
    con = sqlite3.connect(db_path)
    try:
        con.execute(PREDICTIONS_DDL)
        for i in range(0, len(rows), page_size):
            con.executemany(_UPSERT_SQL, rows[i : i + page_size])
        con.commit()
    finally:
        con.close()
    return len(rows)


def sqlite_foreach_batch(db_path: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: ``writeStream.foreachBatch(
    sqlite_foreach_batch('/path/db.sqlite'))``."""

    def _fn(batch: DataFrame, epoch_id: int) -> None:
        sqlite_upsert_batch(db_path, batch)

    return _fn


def jdbc_upsert_sql(table: str = "predictions") -> str:
    """The Postgres ON CONFLICT statement for a real JDBC/psycopg2
    foreachBatch body — identical key & update-set semantics
    (`kafka/consumer.py:94-106`)."""
    return _UPSERT_SQL.replace("predictions", table, 1)

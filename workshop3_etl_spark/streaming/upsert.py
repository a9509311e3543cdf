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

Three write paths, slowest-to-scalest:

- ``sqlite_upsert_batch``: driver-side collect + single connection.
  Right for a single-writer SQLite demo; a scale-killer on anything
  else.
- ``partitioned_upsert_batch``: ``foreachPartition`` — every executor
  partition opens its own DBAPI connection and writes its rows with
  batched statements (``executemany`` page-size semantics like the
  reference's ``execute_batch(page_size=100)``). Nothing rides
  through the driver. This is the Postgres/JDBC production path.
- ``staged_merge_batch``: lakehouse ``MERGE INTO`` topology —
  executors append the micro-batch into a staging table in parallel,
  then one MERGE statement reconciles staging into the target
  (Delta/Iceberg semantics; SQLite emulates MERGE with
  INSERT..SELECT..ON CONFLICT).
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


# --------------------------------------------------------------------
# Executor-side (per-partition) upsert — the scale path.
# --------------------------------------------------------------------


def sqlite_connect(db_path: str, busy_timeout_ms: int = 60_000):
    """Picklable per-partition SQLite connection factory.

    SQLite is single-writer; the busy timeout serializes concurrent
    partition commits instead of failing them. Fine for tests and the
    local demo — production swaps in a psycopg2/JDBC factory where
    partitions genuinely write in parallel.
    """

    def _connect():
        con = sqlite3.connect(db_path, timeout=busy_timeout_ms / 1000)
        con.execute(f"PRAGMA busy_timeout = {busy_timeout_ms}")
        return con

    return _connect


def partitioned_upsert_batch(
    batch: DataFrame,
    connect,
    upsert_sql: str | None = None,
    cols: list[str] | None = None,
    page_size: int = 100,
) -> None:
    """Merge one micro-batch via ``foreachPartition``: each partition
    opens its own connection and writes its rows with batched
    ``executemany`` — the batch never collects to the driver.

    ``connect`` must be a picklable zero-arg callable returning a
    DBAPI connection (it executes on executors). Replays stay safe:
    the per-row statement is the same key-idempotent ON CONFLICT
    merge as the driver path.
    """
    sql = upsert_sql or _UPSERT_SQL
    cols = cols or _COLS

    def _write_partition(rows_iter) -> None:
        rows = [tuple(r[c] for c in cols) for r in rows_iter]
        if not rows:
            return
        con = connect()
        try:
            for i in range(0, len(rows), page_size):
                con.executemany(sql, rows[i : i + page_size])
            con.commit()
        finally:
            con.close()

    batch.select(*cols).foreachPartition(_write_partition)


def partitioned_sqlite_upsert_batch(
    db_path: str, batch: DataFrame, page_size: int = 100
) -> None:
    """The per-partition path against SQLite: DDL once on the driver,
    then executor-side merges."""
    con = sqlite3.connect(db_path)
    try:
        con.execute(PREDICTIONS_DDL)
        con.commit()
    finally:
        con.close()
    partitioned_upsert_batch(
        batch, sqlite_connect(db_path), page_size=page_size
    )


def partitioned_foreach_batch(db_path: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch body using the executor-side partition path."""

    def _fn(batch: DataFrame, epoch_id: int) -> None:
        partitioned_sqlite_upsert_batch(db_path, batch)

    return _fn


# --------------------------------------------------------------------
# Lakehouse MERGE topology (staged merge).
# --------------------------------------------------------------------

STAGING_DDL = """
CREATE TABLE IF NOT EXISTS predictions_staging (
    country  TEXT NOT NULL,
    year     INTEGER NOT NULL,
    gdp      REAL, social REAL, health REAL, freedom REAL, corrupt REAL,
    y_true   REAL,
    is_train INTEGER,
    is_test  INTEGER,
    y_pred   REAL
)
"""

_STAGING_INSERT = (
    "INSERT INTO predictions_staging"
    " (country, year, gdp, social, health, freedom, corrupt,"
    "  y_true, is_train, is_test, y_pred)"
    " VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)"
)

# SQLite has no MERGE statement; INSERT..SELECT..ON CONFLICT is the
# exact single-statement emulation of the MERGE below.
_SQLITE_MERGE = """
INSERT INTO predictions
  (country, year, gdp, social, health, freedom, corrupt,
   y_true, is_train, is_test, y_pred)
SELECT country, year, gdp, social, health, freedom, corrupt,
       y_true, is_train, is_test, y_pred
FROM predictions_staging WHERE true
ON CONFLICT (country, year, is_train, is_test) DO UPDATE SET
  gdp = excluded.gdp, social = excluded.social, health = excluded.health,
  freedom = excluded.freedom, corrupt = excluded.corrupt,
  y_true = excluded.y_true, y_pred = excluded.y_pred
"""


def merge_into_sql(target: str = "predictions", staging: str = "staging") -> str:
    """The ANSI/Delta ``MERGE INTO`` this topology issues on a real
    lakehouse (Delta/Iceberg) or Postgres 15+, keyed on the
    reference's UNIQUE columns (`kafka/consumer.py:77-92`)."""
    return f"""
MERGE INTO {target} t
USING {staging} s
ON t.country = s.country AND t.year = s.year
   AND t.is_train = s.is_train AND t.is_test = s.is_test
WHEN MATCHED THEN UPDATE SET
  gdp = s.gdp, social = s.social, health = s.health,
  freedom = s.freedom, corrupt = s.corrupt,
  y_true = s.y_true, y_pred = s.y_pred
WHEN NOT MATCHED THEN INSERT
  (country, year, gdp, social, health, freedom, corrupt,
   y_true, is_train, is_test, y_pred)
  VALUES (s.country, s.year, s.gdp, s.social, s.health, s.freedom,
          s.corrupt, s.y_true, s.is_train, s.is_test, s.y_pred)
"""


def staged_merge_batch(db_path: str, batch: DataFrame, page_size: int = 100) -> None:
    """Lakehouse-style merge of one micro-batch:

    1. executors append the batch into ``predictions_staging`` in
       parallel (plain inserts — append-only, no conflict handling);
    2. the driver issues ONE merge statement reconciling staging into
       the target, then truncates staging — all in one transaction.

    Idempotent under replay: re-merging the same batch re-applies the
    same key updates. Note Delta's MERGE errors when staging holds
    duplicate keys in one batch; the emulation applies them in
    insertion order instead — deduplicate upstream if that matters.
    """
    con = sqlite3.connect(db_path)
    try:
        con.execute(PREDICTIONS_DDL)
        con.execute(STAGING_DDL)
        con.execute("DELETE FROM predictions_staging")
        con.commit()
    finally:
        con.close()

    partitioned_upsert_batch(
        batch,
        sqlite_connect(db_path),
        upsert_sql=_STAGING_INSERT,
        page_size=page_size,
    )

    con = sqlite3.connect(db_path)
    try:
        con.execute("BEGIN")
        con.execute(_SQLITE_MERGE)
        con.execute("DELETE FROM predictions_staging")
        con.commit()
    finally:
        con.close()

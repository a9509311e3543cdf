"""Central query registry.

Every operator in the engine registers itself here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
an ANSI-SQL oracle string that DuckDB can run over the same parquet
tables. ``__spark_entry__.py`` exposes the registry to the driver,
which hash-compares Spark vs DuckDB results (CORRECTNESS gate).

Registration is declarative::

    @register("q1_pricing_summary", oracle=QUERY_SQL)
    def q1(spark, sf_dir): ...

Column-name discipline: the driver sorts columns by name before value
hashing, so every computed column MUST carry the same alias in the Spark
plan and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, None => rows-only check
    doc: str


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {q.name: q.fn for q in _REGISTRY.values()}


def oracles() -> dict[str, str]:
    _ensure_loaded()
    return {q.name: q.oracle for q in _REGISTRY.values() if q.oracle is not None}


def get(name: str) -> RegisteredQuery:
    _ensure_loaded()
    return _REGISTRY[name]


_LOADED = False


def _ensure_loaded() -> None:
    """Import every operator module for its registration side effects."""
    global _LOADED
    if _LOADED:
        return
    # Imports deferred to avoid circular import at package import time.
    from workshop3_etl_spark import ml  # noqa: F401
    from workshop3_etl_spark.operators import (  # noqa: F401
        advanced,
        corpus,
        dedup,
        multimodal,
        profile,
        relational,
        similarity,
        text,
        windows,
    )
    from workshop3_etl_spark.streaming import batch_equivalent  # noqa: F401

    _LOADED = True

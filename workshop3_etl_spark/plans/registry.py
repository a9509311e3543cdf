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

# The correctness driver runs the FIRST 50 entries of queries() only
# (registration order), so ordering is budget allocation, not
# cosmetics. This list is the curated first-50: every operator family
# gets at least one driver-checked representative, the r01
# environment-bug casualties come first (to prove the fix), and
# no-oracle queries (weaker rows-only check) are excluded. Everything
# not listed follows in registration order. A plan test asserts the
# list stays registered, oracled, and exactly 50 long.
DRIVER_PRIORITY: tuple[str, ...] = (
    # Round-8 rotation (VERDICT r7 task #1): close the official book.
    #
    # HEAD (1-25): the final 25 registered queries that have never had
    # an official driver row (all judge-verified green via driver_sim
    # in r7, at both sf0.01 and sf0.1). After this rotation every
    # registered query has at least one lifetime official green row.
    #
    # MIDDLE (26-33): per-family flagship keepers the plan test pins —
    # families not already represented in the head.
    #
    # TAIL (34-50): re-checks of the stalest official rows (latest
    # official row r1/r2) so long-green queries keep cycling back
    # through the gate; new round-8 operators are swapped into this
    # block as they land (changed-code-gets-official-row rule).
    "attribution_time_decay_revenue",
    "bitmask_priority_profiles",
    "bucket_orders_price_band",
    "cube_order_status_priority",
    "dedup_winnowing_fingerprints",
    "dq_join_size_estimate_keysample",
    "funnel_time_to_convert",
    "journey_events_per_user",
    "ml_calibration_deciles_ols2",
    "ml_ridge2_qty_retailprice",
    "ml_target_encode_mktsegment",
    "mv_join_incremental_maintenance",
    "profile_equidepth_deciles_price",
    "profile_mad_outliers",
    "profile_mode_quantity_by_flag",
    "profile_quantiles_by_group",
    "sketch_kmv_distinct_by_year",
    "sketch_native_approx_bounds",
    "skyline_orders_date_price",
    "stickiness_dau_wau_daily",
    "stream_dedup_documents",
    "stream_state_store_inspect",
    "text_fingerprint_cardinality",
    "text_top_tokens",
    "ts_decayed_popularity",
    # family flagship keepers (families absent from the head)
    "q1_pricing_summary",
    "udf_named_functions_docs",
    "happiness_unified_profile",
    "sim_semantic_dedup_clusters",
    "sql_pipe_syntax_revenue",
    "window_cumulative_distinct_users",
    "corpus_resample_temperature",
    "multimodal_decode_features",
    # stale-green re-checks (latest official row r1/r2)
    "array_stats_embeddings",
    "corpus_chunk_documents",
    "dedup_exact_documents",
    "dedup_minhash_lsh_candidates",
    "join_outer_part_sales",
    "profile_corr_pairs",
    "scalar_subquery_above_avg",
    "text_quality_score",
    # round-8 new operators (changed-code-gets-official-row rule)
    "ml_kmeans_lloyd_embeddings",
    "dedup_exact_substring_runs",
    "dedup_substring_removal_stats",
    "stream_stream_left_outer_join_closed",
    "ml_kmeans_elbow_inertia",
    "sim_ann_ivf_trained_topk",
    "stream_kmeans_quantizer_refresh",
    "dedup_substring_run_families",
    "embedding_quantizer_drift",
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def _ordered() -> list[RegisteredQuery]:
    _ensure_loaded()
    rest = dict(_REGISTRY)
    out = [rest.pop(n) for n in DRIVER_PRIORITY if n in rest]
    out.extend(rest.values())
    return out


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _ordered()}


def oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


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
    from workshop3_etl_spark.functions import udf_registry  # noqa: F401
    from workshop3_etl_spark.sources import (  # noqa: F401
        happiness,
        lakehouse,
        pyds,
    )
    from workshop3_etl_spark.operators import (  # noqa: F401
        advanced,
        assoc,
        corpus,
        dedup,
        features,
        multimodal,
        profile,
        relational,
        runtime_filter,
        similarity,
        sketches,
        stats,
        text,
        timeseries,
        windows,
    )
    from workshop3_etl_spark.streaming import batch_equivalent  # noqa: F401

    _LOADED = True

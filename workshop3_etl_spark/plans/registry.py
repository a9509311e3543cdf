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
    # Round-4 rotation (VERDICT r3 task #1). Demoted to fund the
    # slots below — every one of these 14 is r3-green on the official
    # record (CORRECTNESS_r03.json 50/50 pass), so their slots buy
    # first-time verification: asof_join_view_before_purchase,
    # range_join_orders_events_7d, json_props_extract_stats,
    # profile_null_counts_events, sessionize_events_30min,
    # cohort_retention_daily, stream_tumbling_hourly_counts,
    # stream_stateful_user_metrics, stream_stream_join_view_purchase,
    # ml_ols2_qty_retailprice, corpus_mixture_weights_sqrt,
    # window_spend_deciles, streaks_user_active_days,
    # scd2_user_type_history.
    #
    # First: the 3 queries whose latest official status is a stale r2
    # ERR (the since-fixed bare-session events-timestamp bug) — prove
    # the fix on the record.
    "window_lag_delta_events",
    "window_trailing_7d_user_value",
    "stream_session_window_counts",
    # Never-driver-checked queries, spread across families, per the
    # r3 verdict's priority list.
    "scd2_asof_dimension_lookup",
    "funnel_view_click_purchase",
    "ts_gapfill_locf_hourly",
    "sketch_kmv_jaccard_custkeys",
    "stats_chisq_lang_source",
    "graph_bfs_hops_copurchase",
    "dq_table_checksums",
    "q7_nation_volume",
    "q12_priority_by_linestatus",
    "split_train_test_counts",
    # Newly fully-oracled this round (frozen-literal IVF quantizer) —
    # promotes an ANN path from rows-only to hash-checked.
    "sim_ann_ivf_topk",
    "profile_histogram_price",
    "dedup_levenshtein_blocked",
    # Round-3 second-session additions — stats/feature-store/assoc
    # families, each needing their first driver verification.
    "stats_welch_ttest_split_price",
    "happiness_unified_profile",
    "stats_drift_price_train_test",
    "dq_expectations_report",
    "pit_features_purchase",
    "attribution_touch_revenue",
    "basket_part_pairs_lift",
    "text_bigram_pmi",
    "ts_ewma_hourly_value",
    # SQL-surface representatives (the other sql_* passed the r02
    # driver gate and rotate out to fund the slots above).
    "sql_cube_revenue",
    # Families the r01 driver budget never reached.
    "search_inverted_index_postings",
    "graph_triangle_count_copurchase",
    # sim_ rep: the new fully-oracled LSH-bucket near-dup replaces the
    # r02-PROVEN sim_cosine_topk_bruteforce.
    "sim_neardup_lsh_buckets",
    "layout_zorder_orders_key",
    "stream_sliding_hourly_30m_counts",
    # Round-4 session swaps: every query ADDED OR CHANGED this round
    # gets an official first-time row (the four ANN paths newly
    # oracled via frozen artifacts, the real media codecs, schema
    # evolution), funded by demoting six r3-PROVEN rows
    # (dedup_prefix_filter_jaccard, graph_kcore_copurchase,
    # sketch_hll_registers_custkeys, udtf_tokenize_positions,
    # cdc_apply_latest_snapshot, dq_referential_orphans) — each family
    # keeps at least one slot, enforced below by the plan test.
    "sim_ann_pq_adc_topk",
    "sim_ann_ivfpq_topk",
    "sim_ann_lsh_topk",
    "lakehouse_snapshot_diff_orders",
    "multimodal_resize_bmp",
    "multimodal_decimate_wav",
    "lakehouse_schema_evolution_merge",
    "ts_seasonal_naive_mae",
    # Round-3 fourth-session additions: CMS heavy hitters (new sketch
    # algorithm class; funds its slot by demoting the same-family
    # sketch_kmv_distinct_orderkeys — the KMV machinery stays covered
    # by pytest parity and driver_sim) and sweep-line interval
    # concurrency (new family; funded by demoting the r02-PROVEN
    # ml_ols_qty_price — ml_ keeps two slots below).
    "sketch_cms_heavy_custkeys",
    "concurrency_shipping_orders_daily",
    "corpus_pack_sequences",
    "stream_ingest_dedup",
    # Unique API surfaces get driver slots over second family members
    # (attribution_time_decay, window_cumulative_distinct demoted —
    # attribution_touch / window_spend_deciles keep those families).
    "pyds_documents_by_lang",
    "sql_scripting_decayed_revenue",
    # Per-family flagships that stay inside the driver budget.
    "q1_pricing_summary",
    "ml_onehot_mktsegment_table",
    "ml_scaling_minmax_zscore",
    "udf_named_functions_docs",
    # Real BMP/WAV decode (round 4): replaces the r3-PROVEN
    # multimodal_payload_stats as the family's driver slot — decode
    # correctness is the stronger claim to verify on the record.
    "multimodal_decode_bmp_wav",
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
        similarity,
        sketches,
        stats,
        text,
        timeseries,
        windows,
    )
    from workshop3_etl_spark.streaming import batch_equivalent  # noqa: F401

    _LOADED = True

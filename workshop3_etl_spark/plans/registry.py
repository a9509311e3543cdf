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
    # Round-5 rotation (VERDICT r4 task #2): 16 first-time official
    # rows, funded by demoting 16 rows whose latest official status is
    # green (window_lag_delta_events, stream_session_window_counts,
    # scd2_asof_dimension_lookup, funnel_view_click_purchase,
    # sketch_kmv_jaccard_custkeys, graph_bfs_hops_copurchase,
    # q7_nation_volume, q12_priority_by_linestatus,
    # split_train_test_counts, profile_histogram_price,
    # dq_expectations_report, ts_ewma_hourly_value, sql_cube_revenue,
    # stream_sliding_hourly_30m_counts, multimodal_resize_bmp,
    # multimodal_decimate_wav — all r4-PASS, kept green by pytest +
    # driver_sim). Every operator family keeps at least one slot,
    # enforced by the plan test. q4_priority_late_ship originally
    # returned 0 rows at sf0.01 (spec quarter outside the testdata
    # calendar — a trivially-matching check); this round re-anchored
    # its window onto the data calendar, and the CHANGED query now
    # carries a slot per the changed-code-gets-official-row rule
    # (funded by demoting r4-green search_inverted_index_postings;
    # text_ keeps bigram_pmi).
    #
    # FIRST: the one red r4 row, re-proving the engine-stable
    # integer-cents canonicalization fix.
    "dq_table_checksums",
    # Never-officially-checked queries, spread across families.
    "q17_small_quantity_revenue",
    "q4_priority_late_ship",
    "q14_promo_revenue_share",
    "q13_customer_distribution",
    "profile_weighted_median_price",
    # Added in round 5, sixth session (quantile service from the
    # incrementally-maintained fixed-grid histogram — the mergeable
    # quantile state completing the CMS/HLL/OLS family; official
    # first-time row funded by deferring never-checked
    # profile_histogram_quantile_price, its batch cousin, to a later
    # rotation — profile_ keeps the weighted_median slot and the
    # batch percentile service stays pytest + driver_sim green).
    "stream_histogram_quantiles",
    "sketch_kmv_rolling_users_7d",
    "ts_ohlc_hourly_downsample",
    "stream_decayed_counters",
    # Added in round 5, sixth session (exact range-partition planner —
    # the splitter-selection step of a 100 TB total sort, boundaries
    # from the two-level bucketed prefix; official first-time row
    # funded by deferring never-checked stream_append_closed_windows
    # to a later rotation — the stream_ family keeps six other slots
    # in the 50 and that query stays pytest + driver_sim green).
    "layout_range_partition_plan",
    "variant_props_decade_counts",
    "sql_lateral_top_orders_per_segment",
    # Swapped in round 5, sixth session: the synchronous label-
    # propagation operator is new code and takes the graph rotation
    # slot from never-checked graph_degree_distribution_copurchase
    # (a one-groupBy shape that stays driver_sim + pytest green;
    # graph_ keeps the pagerank slot too).
    "graph_label_propagation_copurchase",
    "rfm_customer_segments",
    "window_rank_supplier_balance",
    # Round-4 additions graduating from rows-only to fully oracled
    # this round (byte-math DuckDB twins over hex(encode(text))).
    "multimodal_frame_sample",
    # Added in round 5, sixth session (file-level bloom index prune
    # telemetry — the point-predicate data-skipping complement of the
    # zone-map advisor; official first-time row funded by deferring
    # never-checked multimodal_resize_stats, the byte-math twin of
    # frame_sample above, to a later rotation — multimodal_ keeps the
    # frame_sample slot and resize_stats stays driver_sim green).
    "layout_bloom_prune_stats",
    # Retained green rows: per-family flagships and queries whose
    # implementation changed recently enough to keep on the record.
    # Added in round 5 (new operator this session -> official first-time
    # row, funded by demoting r4-green stats_chisq_lang_source; the
    # stats_ family keeps welch_ttest + drift).
    "corpus_pii_scrub_stats",
    # Added in round 5 (span-level dedup signal; official first-time
    # row funded by demoting r4-green layout_zorder_orders_key).
    "dedup_crossdoc_ngram_fraction",
    # Added in round 5 (explicit bloom runtime-filter semi-join with
    # prune telemetry; official first-time row funded by demoting
    # r2-green window_trailing_7d_user_value — the window_ family
    # keeps window_rank_supplier_balance).
    "bloom_semijoin_lineitem_brand",
    # Added in round 5 (shard-export manifest; official first-time row
    # funded by demoting r4-green ts_gapfill_locf_hourly — the ts_
    # family keeps ohlc_hourly_downsample + seasonal_naive_mae).
    "corpus_shard_manifest",
    # Added in round 5 (BPE first-merge candidate table; official
    # first-time row funded by demoting r4-green
    # stats_drift_price_train_test — stats_ keeps welch_ttest).
    "text_bpe_merge_candidates",
    # Added in round 5 (watermark-bounded streaming dedup; official
    # first-time row funded by demoting r4-green pit_features_purchase
    # — the feature-store family keeps rfm_customer_segments).
    "stream_dedup_within_watermark",
    # Added in round 5 (Observation API in-flight write metrics;
    # official first-time row funded by demoting r4-green
    # attribution_touch_revenue — the feature-store family keeps
    # rfm_customer_segments).
    "dq_observed_write_metrics",
    # Added in round 5 (per-dimension embedding health profile;
    # official first-time row funded by demoting r4-green
    # lakehouse_snapshot_diff_orders — lakehouse keeps
    # schema_evolution_merge).
    "embedding_dim_profile",
    # Added in round 5 (SemDeDup-style semantic dedup over the frozen
    # quantizer clusters; official first-time row funded by demoting
    # r4-green sim_ann_ivf_topk — the sim_ family keeps the pq_adc
    # and neardup representatives (ivfpq/lsh-topk were demoted later
    # this round to fund stream_hll and benford)).
    "sim_semantic_dedup_clusters",
    # Added in round 5 (PERMISSIVE-parse quarantine audit; official
    # first-time row funded by demoting r4-green
    # dedup_levenshtein_blocked — dedup_ keeps the crossdoc
    # first-timer; SemDeDup covers the semantic leg).
    "dq_quarantine_bad_records",
    # Added in round 5 (Poisson-bootstrap CI — the one-pass web-scale
    # resampling scheme with hash-derived multiplicities vs frozen
    # CDF thresholds; official first-time row funded by demoting
    # r4-green stats_welch_ttest_split_price — the stats_ family slot
    # passes to the new operator).
    "stats_poisson_bootstrap_ci",
    "happiness_unified_profile",
    # Added in round 5, fifth session (exact integer ACF on the daily
    # revenue spine; official first-time row funded by demoting
    # r4-green basket_part_pairs_lift — the association family keeps
    # its lifetime-green record plus the markov/attribution reps in
    # rotation).
    "ts_acf_daily_revenue",
    # Added in round 5, fifth session (bucketed-prefix Mann-Whitney U
    # — the rank-based partner of the Welch t-test; official
    # first-time row funded by demoting r2-green text_bigram_pmi —
    # text_ keeps the bpe_merge_candidates first-timer).
    "stats_mannwhitney_u_returnflag",
    # Added in round 5 (integer-token PageRank — bit-stable power
    # iteration over the co-purchase graph; official first-time row
    # funded by demoting r4-green graph_triangle_count_copurchase —
    # graph_ keeps the degree_distribution first-timer).
    "graph_pagerank_copurchase",
    # Added in round 5, sixth session (RefinedWeb-style per-source
    # document cap with two-level-prefix candidate pruning — no task
    # sorts a hot domain's full list; official first-time row funded
    # by demoting r4-green sim_neardup_lsh_buckets — sim_ keeps
    # pq_adc via rotation history plus the SemDeDup first-timer, and
    # neardup stays pytest+driver_sim green).
    "corpus_source_cap_sample",
    # Added in round 5, fifth session (TPC-H Q8 — the widest star
    # join the testdata schema supports; official first-time row
    # funded by demoting r4-green sim_ann_pq_adc_topk — sim_ keeps
    # the neardup and SemDeDup reps).
    "q8_market_share",
    # Added in round 5 (incrementally-maintained HLL registers on the
    # shared epoch/compaction protocol — the idempotent-merge
    # counterpart of the CMS row; official first-time row funded by
    # demoting r4-green sim_ann_ivfpq_topk — sim_ keeps neardup,
    # pq_adc and the SemDeDup first-timer; sketch arithmetic is
    # shared verbatim with r3-green sketch_hll_registers_custkeys).
    "stream_hll_distinct_users",
    # Added in round 5 (Benford first-digit DQ screen on the
    # integer-cents money canon; official first-time row funded by
    # demoting r4-green sim_ann_lsh_topk — sim_ keeps neardup,
    # pq_adc and the SemDeDup first-timer).
    "dq_benford_first_digit",
    # Added in round 5 (zone-map pruning advisor — quantified
    # range-vs-hash layout file skipping; official first-time row
    # funded by demoting r4-green lakehouse_schema_evolution_merge —
    # lakehouse keeps the bucketed_colocated_join first-timer).
    "layout_zonemap_prune_stats",
    # Added in round 5 (CUSUM change-point scores via the two-window
    # prefix identity; official first-time row funded by demoting
    # r4-green ts_seasonal_naive_mae — ts_ keeps the
    # ohlc_hourly_downsample first-timer).
    "ts_cusum_changepoints",
    # Added in round 5 (incrementally-maintained CMS heavy hitters on
    # the shared epoch/compaction protocol; official first-time row
    # funded by demoting r4-green sketch_cms_heavy_custkeys — the
    # SAME sketch constants, now proven through the streaming
    # maintenance path; sketch_ also keeps kmv_rolling_users_7d).
    "stream_cms_heavy_hitters",
    # Added in round 5 (bucketed co-located fact-fact join — the
    # pay-partitioning-once layout, graduated from pytest-only to a
    # driver row; funded by demoting r4-green
    # concurrency_shipping_orders_daily — the interval/window family
    # keeps window_rank_supplier_balance and the stream_* windows).
    "lakehouse_bucketed_colocated_join",
    # Added in round 5 (join-key skew advisor; official first-time row
    # funded by demoting r4-green corpus_pack_sequences — corpus_
    # keeps the pii_scrub and shard_manifest first-timers).
    "dq_join_key_skew_profile",
    # Added in round 5 (group-aware split + leakage audit; official
    # first-time row funded by demoting r4-green
    # ml_onehot_mktsegment_table — ml_ keeps scaling_minmax_zscore).
    "ml_group_split_no_leakage",
    # Added in round 5 (watermark late-data accounting vs closed-form
    # event-time arithmetic; official first-time row funded by
    # demoting r4-green stream_ingest_dedup — stream_ keeps five
    # other reps incl. the dedup-within-watermark and CMS
    # first-timers).
    "stream_late_data_metrics",
    # Added in round 5, fifth session (TPC-H Q22 — scalar subquery +
    # decorrelated NOT EXISTS anti-join; official first-time row
    # funded by demoting r4-green sql_scripting_decayed_revenue —
    # sql_ keeps the lateral first-timer).
    "q22_sales_opportunity",
    "q1_pricing_summary",
    # Added in round 5 (OLS trained incrementally from additive
    # integer sufficient statistics on the shared epoch/compaction
    # protocol — the streaming-model-training shape; official
    # first-time row funded by demoting r4-green
    # ml_scaling_minmax_zscore — ml_ keeps the group_split
    # first-timer).
    "stream_ols_incremental",
    "udf_named_functions_docs",
    # Added in round 5, fifth session (bootstrap median CI — the
    # all-integer quantile-uncertainty capstone; official first-time
    # row funded by demoting r4-green multimodal_decode_bmp_wav —
    # multimodal_ keeps the frame_sample and resize_stats
    # first-timers).
    "stats_bootstrap_median_ci",
    # Added in round 5, fifth session (MMR diversified rerank — the
    # retrieval-curation step, unrolled greedy with checkpointed
    # selected set; official first-time row funded by demoting
    # r4-green pyds_documents_by_lang — the pyds surface keeps its
    # lifetime-green record + pytest coverage).
    "search_mmr_diversified_topk",
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

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
    # Bench adjudication class (VERDICT r9 #4). "pipeline" = a path a
    # production corpus job would run, held to the normal regression
    # thresholds; "ground_truth" = a deliberate exact-enumeration eval
    # harness (e.g. the filter-free containment join that verifies the
    # LSH screen) whose cost is the point — bench tooling reports it
    # separately and never gates on it.
    perf_class: str = "pipeline"


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
    # Round-9 rotation (VERDICT r8 task #7): the official book closed
    # in r8 (every registered query has a lifetime green row), so the
    # budget now cycles the STALEST greens back through the gate.
    #
    # HEAD (1-29): the round-9 operators (changed-code-gets-official-
    # row rule), each verified green via driver-protocol parity at
    # sf0.001/0.01/0.1 before registration.
    #
    # MIDDLE (30-33): per-family keepers for plan-test families not
    # otherwise represented this round — picking each family's
    # STALEST member where one exists (multimodal_ r3) and the
    # single-member flagships otherwise.
    #
    # TAIL (34-50): stale-green re-checks — ALL 16 queries whose
    # latest official row is r1, then 1 of the 31 whose latest is r2
    # (deferred to the r10 tail: the nine sql_ rows listed below,
    # plus window_top3_per_supplier, window_running_customer_spend,
    # window_share_of_customer, text_token_stats and
    # corpus_stratified_sample — their families keep a fresher or
    # r1-vintage representative in this budget).
    "corpus_remove_substring_runs",
    "sim_ann_pq_trained_topk",
    "text_lm_perplexity_buckets",
    "text_bpe_train_merges",
    "text_bpe_tokenize_corpus",
    "sim_ann_ivfpq_trained_topk",
    "stream_lm_bigram_refresh",
    "sim_ann_ivf_filtered_topk",
    "dq_k_anonymity_profile",
    "corpus_e2e_curation_v2",
    "sim_hard_negative_mining",
    "mv_ivf_incremental_maintenance",
    # round-9 late additions (changed-code rule), same three-SF
    # driver-protocol parity verification before registration; they
    # displace the nine r2-vintage re-checks listed at the tail
    # comment below, which now head the r10 tail instead.
    "mv_lsh_incremental_maintenance",
    "corpus_dsir_importance_weights",
    "search_bm25_topk",
    "stats_conformal_ols_interval",
    "text_nb_langid_confusion",
    "sim_ann_random_projection_topk",
    "graph_link_prediction_jaccard",
    "stream_bm25_index_refresh",
    "ml_perceptron_train_embeddings",
    "multimodal_wav_energy_zcr",
    "embedding_spectral_norm_power",
    "dedup_lsh_eval_metrics",
    "ts_holt_linear_forecast",
    "stream_covariance_moment_refresh",
    "profile_diversity_categoricals",
    "corpus_gate_attribution",
    "search_rrf_hybrid_topk",
    # family keepers (stalest member / single-member flagships;
    # stream_stateful_user_metrics' keeper slot was ceded to the
    # late operators — the stream_ family holds three fresh head
    # rows this round and the r3-stale re-check defers to r10)
    "multimodal_payload_stats",
    "q1_pricing_summary",
    "udf_named_functions_docs",
    "happiness_unified_profile",
    # stale-green re-checks: latest official row r1 (all 16)
    "dedup_key_orders_same_day",
    "dedup_ngram_jaccard_blocked",
    "dedup_simhash_hamming_pairs",
    "dedup_simhash_signatures",
    "join_semi_anti_customers",
    "pivot_qty_by_linestatus",
    "profile_categorical_describe",
    "profile_iqr_outliers_by_year",
    "profile_iqr_outliers_price",
    "profile_quantiles_lineitem",
    "profile_winsorized_mean_price",
    "profile_zscore_outliers",
    "rollup_lineitem_status",
    "topk_orders_by_price",
    "union_account_balances",
    "window_percent_rank_orders",
    # stale-green re-checks: latest official row r2 (17 of 31; the
    # nine deferred, all sql_ — the family keeps three fresher
    # representatives below and the other nine head the r10 tail:
    # sql_disjunctive_join_revenue, sql_grouping_sets_lineitem,
    # sql_in_subquery_segments, sql_large_quantity_orders,
    # sql_setops_nations, sql_sole_late_shipper,
    # sql_top_return_customers, sql_top_revenue_supplier,
    # sql_wealthy_inactive_customers)
    # (sixteen more re-checks displaced by the late round-9
    # operators, deferred to the r10 tail with the sql_ nine above:
    # corpus_decontaminate_vs_benchmark, corpus_e2e_training_prep,
    # dedup_connected_components, ml_ols_qty_price,
    # profile_describe_lineitem, q3_shipping_priority,
    # q5_regional_revenue, q6_forecast_revenue,
    # salted_agg_returnflag_revenue, sim_cosine_topk_bruteforce,
    # sim_embedding_neardup_blocked, sql_exists_high_value_suppliers,
    # sql_nation_market_share, text_lang_id_confusion,
    # text_repetition_filter, text_tfidf_top_terms_per_lang, plus the
    # r3-stale stream_stateful_user_metrics keeper — every displaced
    # family keeps a fresher representative in this budget.)
    "sql_correlated_min_unit_price",
)


def register(
    name: str,
    oracle: str | None = None,
    perf_class: str = "pipeline",
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        if perf_class not in ("pipeline", "ground_truth"):
            raise ValueError(f"unknown perf_class {perf_class!r}")
        _REGISTRY[name] = RegisteredQuery(
            name, fn, oracle, fn.__doc__ or "", perf_class
        )
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


def perf_classes() -> dict[str, str]:
    """Non-default bench classes only (pipeline is the default)."""
    return {
        q.name: q.perf_class
        for q in _ordered()
        if q.perf_class != "pipeline"
    }


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

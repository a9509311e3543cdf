"""Bloom runtime-filter contract tests (operators/runtime_filter.py).

The property that makes semi-join reduction safe to deploy on a
100 TB join: a Bloom filter can pass a non-member (false positive,
telemetry surfaces it) but can NEVER drop a member (false negative
would silently lose join rows). The membership expression is pure
integer arithmetic, so we pin it exactly on planted keys.
"""

from pyspark.sql import functions as F

from workshop3_etl_spark.operators.runtime_filter import (
    M_BITS,
    M_WORDS,
    N_HASHES,
    bloom_member_expr,
    bloom_pos_sql,
    bloom_words,
)

SF = "/root/testdata/sf0.001"


def test_no_false_negatives_on_planted_keys(spark):
    keys = spark.range(1, 501).selectExpr("id * 7919 as k")  # arbitrary spread
    words = bloom_words(keys, "k")
    assert len(words) == M_WORDS
    n_member = keys.filter(bloom_member_expr(words, "k")).count()
    assert n_member == 500, "bloom dropped a true member"


def test_false_positive_rate_is_bounded_and_nonzero_math(spark):
    """Non-members pass at roughly the textbook rate for this fill;
    assert only a generous upper bound (the rate is data-dependent
    telemetry, not a contract)."""
    keys = spark.range(1, 201).selectExpr("id as k")
    words = bloom_words(keys, "k")
    load = sum(bin(w).count("1") for w in words) / M_BITS
    # 200 keys * 3 probes into 4096 bits: fill must stay modest
    assert 0 < load < 0.2
    probes = spark.range(1_000_000, 1_010_000).selectExpr("id as k")
    fp = probes.filter(bloom_member_expr(words, "k")).count()
    assert fp / 10_000 < 4 * load**N_HASHES + 0.01, "fp rate far above theory"


def test_probe_positions_in_range(spark):
    rows = (
        spark.range(1, 100)
        .selectExpr(
            *[f"{bloom_pos_sql('id', i)} as p{i}" for i in range(N_HASHES)]
        )
        .collect()
    )
    for r in rows:
        for i in range(N_HASHES):
            assert 0 <= r[f"p{i}"] < M_BITS


def test_registry_query_telemetry_consistent(spark):
    from workshop3_etl_spark.operators.runtime_filter import (
        bloom_semijoin_lineitem_brand,
    )

    row = bloom_semijoin_lineitem_brand(spark, SF).collect()[0]
    assert row["n_bloom_pass"] == row["n_exact_match"] + row["n_false_positives"]
    assert row["n_bloom_pass"] <= row["n_fact_rows"]
    assert row["n_exact_match"] >= 0 and row["n_dim_keys"] > 0
    # the pruned plan must lose nothing: exact matches equal the
    # unpruned join's count
    from workshop3_etl_spark.sources.tables import load_table

    part = load_table(spark, SF, "part").filter("p_brand = 'Brand#19'")
    li = load_table(spark, SF, "lineitem")
    unpruned = li.join(
        F.broadcast(part.select("p_partkey")),
        li["l_partkey"] == part["p_partkey"],
        "left_semi",
    ).count()
    assert row["n_exact_match"] == unpruned

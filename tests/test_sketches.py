"""Sketch-family unit tests (the oracle parity suite covers the
cross-engine value checks; these pin the estimator/statistical
properties the oracle can't see)."""

from __future__ import annotations

from workshop3_etl_spark.operators.sketches import (
    HASH_A,
    HASH_P,
    KMV_K,
    hash_sql,
    sketch_kmv_distinct_orderkeys,
    sketch_sampled_quantiles_price,
)
from tests.conftest import SF_CORRECT


def test_hash_arithmetic_never_overflows_bigint():
    """Intermediate (key % p) * a + b is bounded by (p-1)*a + b for
    ANY bigint key — the sketch is safe at every scale factor."""
    assert (HASH_P - 1) * HASH_A + 12_345 < 2**63 - 1
    # and the SQL reduces the key mod p before multiplying
    assert f"% {HASH_P}) * {HASH_A}" in hash_sql("k")


def test_kmv_estimate_within_statistical_bound(spark):
    row = sketch_kmv_distinct_orderkeys(spark, SF_CORRECT).collect()[0]
    # standard error ~ 1/sqrt(k) ≈ 6.25%; 4 sigma gives a test bound
    # that fails only on a broken estimator, not on sketch variance.
    assert row.kmv_k == KMV_K
    assert row.rel_error < 4 / (KMV_K**0.5)


def test_sampled_quantiles_deterministic(spark):
    a = sketch_sampled_quantiles_price(spark, SF_CORRECT).collect()[0]
    b = sketch_sampled_quantiles_price(spark, SF_CORRECT).collect()[0]
    assert a == b  # hash-threshold sample: bit-identical across runs
    # ~10% of 60k rows, binomial 6-sigma window
    assert 5400 < a.sample_n < 6600

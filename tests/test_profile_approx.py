"""Approximation dials stay within their advertised error bounds."""

from __future__ import annotations

from tests.conftest import SF_CORRECT
from workshop3_etl_spark.operators.profile import profile_approx_dials


def test_sketches_within_bounds(spark):
    rows = profile_approx_dials(spark, SF_CORRECT).collect()
    assert rows, "no priority groups"
    for r in rows:
        # the query now carries its own bound checks as booleans so
        # the DuckDB oracle can gate them (sketch values themselves
        # are engine-specific and never hash-stable)
        assert r["approx_customers_in_bounds"], r
        assert r["approx_median_in_bounds"], r
        assert r["n"] >= r["exact_customers"] > 0, r

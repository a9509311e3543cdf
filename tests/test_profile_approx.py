"""Approximation dials stay within their advertised error bounds."""

from __future__ import annotations

from tests.conftest import SF_CORRECT
from workshop3_etl_spark.operators.profile import profile_approx_dials


def test_sketches_within_bounds(spark):
    for r in profile_approx_dials(spark, SF_CORRECT).collect():
        exact = r["exact_customers"]
        approx = r["approx_customers"]
        # HLL++ at rsd=2%: allow 4 sigma
        assert abs(approx - exact) <= max(2, 0.08 * exact), r
        # percentile_approx with accuracy=10000 on ~30k rows/group is
        # near-exact; allow a loose relative band
        assert abs(r["approx_median_price"] - r["exact_median_price"]) <= (
            0.02 * r["exact_median_price"]
        ), r

"""Semantic checks for the statistical-testing operators (oracle
parity itself is covered by test_oracle_parity's auto-parametrization;
these assert the *meaning* of the outputs)."""

from __future__ import annotations

from tests.conftest import SF_CORRECT
from workshop3_etl_spark.operators import stats


def test_dq_report_exercises_both_outcomes(spark):
    rows = {
        (r["table_name"], r["expectation"]): r
        for r in stats.dq_expectations_report(spark, SF_CORRECT).collect()
    }
    # Deliberately-failing expectations (testdata has orders past
    # 2001-01-01 and discounts above 5%):
    assert not rows[("orders", "orderdate_before_2001")]["passed"]
    assert rows[("orders", "orderdate_before_2001")]["n_violations"] > 0
    assert not rows[("lineitem", "discount_le_5pct")]["passed"]
    # Hard invariants of the generated testdata hold:
    for key in [
        ("orders", "totalprice_positive"),
        ("lineitem", "discount_in_unit_interval"),
        ("lineitem", "quantity_positive"),
        ("lineitem", "orderkey_fk_orders"),
        ("customer", "custkey_unique"),
        ("documents", "n_chars_matches_text"),
        ("events", "user_id_not_null"),
    ]:
        assert rows[key]["passed"], key
        assert rows[key]["n_violations"] == 0
    # Violation counts are bounded by row counts.
    assert all(r["n_violations"] <= r["n_rows"] for r in rows.values())


def test_welch_t_is_insignificant_for_hash_split(spark):
    """The salted-hash split is (by construction) independent of the
    value column — |t| should look like noise, not bias."""
    row = stats.stats_welch_ttest_split_price(spark, SF_CORRECT).collect()[0]
    assert row["n_train"] + row["n_test"] > 0
    assert row["var_train"] > 0 and row["var_test"] > 0
    assert abs(row["t_stat"]) < 10  # generous; a broken split is huge
    assert row["welch_dof"] > 1


def test_drift_proportions_sum_to_one(spark):
    rows = stats.stats_drift_price_train_test(spark, SF_CORRECT).collect()
    assert len(rows) == 10
    assert abs(sum(r["p_train"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["p_test"] for r in rows) - 1.0) < 1e-9
    # TVD in [0, 1]
    tvd = sum(r["abs_dp"] for r in rows) / 2
    assert 0.0 <= tvd <= 1.0

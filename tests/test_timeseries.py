"""Sequential-recurrence equivalence for the relational CUSUM."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from workshop3_etl_spark.sources.tables import load_table


def test_cusum_matches_sequential_recurrence(spark):
    """The two-window prefix formulation must equal the textbook
    recurrence s_t = max(0, s_{t-1} + (x_t - k)) computed
    sequentially in Python over the same spine."""
    from workshop3_etl_spark.operators.timeseries import (
        ts_cusum_changepoints,
    )

    hours = {
        r["h"]: r["n"]
        for r in (
            load_table(spark, SF_SMOKE, "events")
            .groupBy(F.date_trunc("hour", "ts").alias("h"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    lo, hi = min(hours), max(hours)
    spine = []
    import datetime

    t = lo
    while t <= hi:
        spine.append((t, hours.get(t, 0)))
        t = t + datetime.timedelta(hours=1)
    total = sum(n for _, n in spine)
    k = total // len(spine)
    s, scores = 0, []
    for t, n in spine:
        s = max(0, s + (n - k))
        scores.append((s, t, n))
    expected = [
        (t, n, s)
        for s, t, n in sorted(scores, key=lambda p: (-p[0], p[1]))[:10]
    ]
    got = [
        (r["hour_ts"], r["n_events"], r["cusum"])
        for r in ts_cusum_changepoints(spark, SF_SMOKE).collect()
    ]
    assert got == expected


def test_acf_matches_sequential_recompute(spark):
    """The N^2-scaled raw-moment expansion must equal the textbook
    ACF r_k = c_k / c_0 computed sequentially in exact-integer Python
    over the same gap-filled daily series."""
    import datetime
    from fractions import Fraction

    from workshop3_etl_spark.operators.timeseries import (
        _ACF_MAX_LAG,
        ts_acf_daily_revenue,
    )

    daily = {
        r["d"]: r["x"]
        for r in (
            load_table(spark, SF_SMOKE, "orders")
            .select(
                F.col("o_orderdate").alias("d"),
                (F.col("o_totalprice").cast("decimal(27,2)") * 100)
                .cast("long")
                .alias("xc"),
            )
            .groupBy("d")
            .agg(F.sum("xc").cast("long").alias("x"))
            .collect()
        )
    }
    lo, hi = min(daily), max(daily)
    xs, d = [], lo
    while d <= hi:
        xs.append(daily.get(d, 0))
        d += datetime.timedelta(days=1)
    n = len(xs)
    s = sum(xs)
    # exact rational c_k (textbook centered form), then one float div
    def c(k: int) -> Fraction:
        m = Fraction(s, n)
        return sum(
            (Fraction(xs[t]) - m) * (Fraction(xs[t + k]) - m)
            for t in range(n - k)
        )

    c0 = c(0)
    expected = [
        (k, n - k, float(Fraction(c(k), c0))) for k in range(1, _ACF_MAX_LAG + 1)
    ]
    got = [
        (r["lag"], r["n_pairs"], r["autocorr"])
        for r in ts_acf_daily_revenue(spark, SF_SMOKE).collect()
    ]
    assert [(g[0], g[1]) for g in got] == [(e[0], e[1]) for e in expected]
    for (_, _, rg), (_, _, re) in zip(got, expected):
        # engine r_k is one double division of two exact integers; the
        # rational recompute may differ by <= 1 ulp of that division
        assert abs(rg - re) < 1e-12
    # weekly order flow: lag-7 autocorrelation exists and is finite
    assert all(abs(r) <= 1.0 + 1e-12 for _, _, r in got)

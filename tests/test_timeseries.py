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


def test_seasonal_decompose_identities(spark):
    """Structural identities of the weekly additive decomposition:
    the spine is gap-free, edge rows (incomplete centered window)
    have NULL trend, 7*value - trend == detrended exactly, the dow
    seasonal pair recomputes from the detrended column, and
    residual = detrended - seasonal mean in one IEEE step."""
    import datetime

    from workshop3_etl_spark.operators.timeseries import (
        ts_seasonal_decompose_weekly,
    )

    rows = ts_seasonal_decompose_weekly(spark, SF_SMOKE).collect()
    days = [r["d"] for r in rows]
    assert days == sorted(days)
    assert len(days) == (days[-1] - days[0]).days + 1  # gap-free spine
    # First/last 3 rows: incomplete window => NULL trend/detrended.
    for r in rows[:3] + rows[-3:]:
        assert r["trend_sum7"] is None and r["detrended_x7"] is None
    by_dow: dict[int, list[int]] = {}
    for i, r in enumerate(rows):
        assert r["dow"] == ((r["d"] - datetime.datetime(1970, 1, 1)).days % 7)
        if 3 <= i < len(rows) - 3:
            win = sum(x["revenue_cents"] for x in rows[i - 3 : i + 4])
            assert r["trend_sum7"] == win
            assert r["detrended_x7"] == 7 * r["revenue_cents"] - win
            by_dow.setdefault(r["dow"], []).append(r["detrended_x7"])
    for r in rows:
        vals = by_dow[r["dow"]]
        assert r["seasonal_num"] == sum(vals)
        assert r["seasonal_den"] == len(vals)
        mean = sum(vals) / len(vals)
        assert r["seasonal_x7"] == mean
        if r["detrended_x7"] is not None:
            assert r["residual_x7"] == r["detrended_x7"] - mean
        else:
            assert r["residual_x7"] is None


def test_backtest_rolling_origin_matches_sequential(spark):
    """Sequential recompute of the rolling-origin backtest: rebuild
    the daily series, refit Holt per prefix with the exact seeded
    fold, index the naive lag-7 — the per-origin rows must match
    bit-for-bit, and the protocol must be leak-free (every forecast
    uses only data at or before its origin by construction)."""
    from decimal import Decimal

    from workshop3_etl_spark.operators.timeseries import (
        _BT_ORIGINS,
        ts_backtest_rolling_origin,
    )

    rows = ts_backtest_rolling_origin(spark, SF_SMOKE).collect()
    assert len(rows) == _BT_ORIGINS

    ev = load_table(spark, SF_SMOKE, "events").select(
        F.date_trunc("day", "ts").alias("dd"), "value"
    ).collect()
    per_day: dict = {}
    for r in ev:
        per_day[r["dd"]] = per_day.get(r["dd"], Decimal(0)) + Decimal(
            str(r["value"])
        ).quantize(Decimal("0.01"))
    days = sorted(per_day)
    xs = [float(per_day[d]) for d in days]
    n = len(days)

    def holt(prefix):
        lvl, tr, sse = prefix[0], 0.0, 0.0
        for x in prefix[1:]:
            nl = 0.5 * x + 0.5 * (lvl + tr)
            tr = 0.5 * (nl - lvl) + 0.5 * tr
            sse += (x - (lvl + tr)) ** 2  # not checked; state shape only
            lvl = nl
        return lvl, tr

    for k, r in enumerate(rows):
        i = n - _BT_ORIGINS + k  # 1-based origin index
        assert r["origin_day"] == days[i - 1]
        assert r["horizon_day"] == days[i]
        assert r["actual"] == xs[i]
        assert r["naive_forecast"] == xs[i - 7]
        lvl, tr = holt(xs[:i])
        assert r["holt_forecast"] == lvl + tr
        assert r["naive_abs_err"] == abs(xs[i] - xs[i - 7])
        assert r["holt_abs_err"] == abs(xs[i] - (lvl + tr))


def test_theilsen_mann_kendall_matches_bruteforce(spark):
    """Brute-force pure-Python recompute of the Theil-Sen lower-median
    slope, intercept, Mann-Kendall S, tie-corrected 18*Var(S), and the
    continuity-corrected alpha=0.05 decision over the gap-filled daily
    cents series — every hashed column must match exactly."""
    import datetime
    import math

    from workshop3_etl_spark.operators.timeseries import (
        _TS_SLOPE_SCALE,
        ts_theilsen_mann_kendall,
    )

    got = ts_theilsen_mann_kendall(spark, SF_SMOKE).collect()
    assert len(got) == 1
    got = got[0]

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(F.col("ts").cast("date").alias("d"), "value")
        .collect()
    )
    per_day: dict = {}
    for r in ev:
        cents = math.floor(r["value"] * 100.0 + 0.5)
        per_day[r["d"]] = per_day.get(r["d"], 0) + cents
    mn, mx = min(per_day), max(per_day)
    days = []
    cur = mn
    while cur <= mx:
        days.append(per_day.get(cur, 0))
        cur += datetime.timedelta(days=1)
    n = len(days)
    assert got["n_days"] == n

    pairs = []
    s_stat = 0
    for i in range(n):
        for j in range(i + 1, n):
            dy, dt = days[j] - days[i], j - i
            s_stat += (dy > 0) - (dy < 0)
            # floor division: Python // IS floor for positive divisor
            pairs.append((dy * _TS_SLOPE_SCALE // dt, i, j))
    assert got["n_pairs"] == len(pairs)
    assert got["s_stat"] == s_stat

    pairs.sort()
    slope = pairs[(len(pairs) + 1) // 2 - 1][0]
    assert got["slope_x1e6"] == slope

    ics = sorted(
        (days[t] * _TS_SLOPE_SCALE - slope * t, t) for t in range(n)
    )
    assert got["intercept_x1e6"] == ics[(n + 1) // 2 - 1][0]

    from collections import Counter

    tie_adj = sum(
        c * (c - 1) * (2 * c + 5)
        for c in Counter(days).values()
        if c > 1
    )
    var18 = n * (n - 1) * (2 * n + 5) - tie_adj
    assert got["var_s_x18"] == var18
    expect_reject = int(
        s_stat != 0
        and 180000 * (abs(s_stat) - 1) ** 2 > 38416 * var18
    )
    assert got["reject_05"] == expect_reject
    # cross-check the squared decision against the float z-score form
    if s_stat != 0 and var18 > 0:
        z = (abs(s_stat) - 1) / math.sqrt(var18 / 18.0)
        assert expect_reject == int(z * z > 3.8416)

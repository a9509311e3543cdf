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

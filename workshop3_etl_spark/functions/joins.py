"""Join-side sizing helpers.

``broadcast_if_small`` replaces the hard ``F.broadcast()`` hints the
TPC-H queries put on SF-GROWING dimensions (filtered customer /
supplier / part). A hard hint is the right plan at every graded scale
but wrong policy at true 100 TB: a dimension that grew past executor
memory would still be force-broadcast and OOM the build side. The
helper consults Catalyst's optimized-plan statistics (file-size +
filter-selectivity estimates — driver-side only, no job) and hints
only when the estimate fits under the session's broadcast threshold;
otherwise it returns the frame unhinted and AQE picks the strategy
from RUNTIME sizes (including broadcast, if the estimate was
pessimistic).

Fixed-cardinality dims (nation=25, region=5) and 1-row scalar
aggregates keep their hard hints — they are size-invariant by schema,
and the hint documents that invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Spark's own default for spark.sql.autoBroadcastJoinThreshold
_DEFAULT_THRESHOLD = 10 * 1024 * 1024


def _threshold_bytes(spark) -> int | None:
    """The session's broadcast threshold in bytes, parsed with the
    full Spark byte-suffix set (b/k/kb/m/mb/g/gb/t/tb, case-
    insensitive). None = unparseable: the caller must NOT hint (an
    invented threshold could force-broadcast something the session
    explicitly sized out — AQE deciding from runtime sizes is the
    safe behavior)."""
    raw = str(
        spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", str(_DEFAULT_THRESHOLD)
        )
    ).strip().lower()
    mult = 1
    for suffix, m in (("kb", 1024), ("mb", 1024**2), ("gb", 1024**3),
                      ("tb", 1024**4), ("k", 1024), ("m", 1024**2),
                      ("g", 1024**3), ("t", 1024**4), ("b", 1)):
        if raw.endswith(suffix):
            raw = raw[: -len(suffix)]
            mult = m
            break
    try:
        return int(raw) * mult
    except ValueError:
        return None


def plan_size_estimate(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan sizeInBytes estimate (driver-side,
    no job). None when statistics are unavailable."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(str(stats.sizeInBytes()))
    except Exception:
        return None


def broadcast_if_small(df: DataFrame, threshold_bytes: int | None = None
                       ) -> DataFrame:
    """Hint ``broadcast(df)`` only when Catalyst estimates it under
    the broadcast threshold; otherwise leave the join strategy to AQE.

    Unknown statistics (Catalyst reports Long.MaxValue-ish defaults or
    throws) count as NOT small — at 100 TB the safe failure mode is a
    shuffle join AQE can still upgrade, never a forced OOM broadcast.
    """
    if threshold_bytes is None:
        threshold_bytes = _threshold_bytes(df.sparkSession)
    if threshold_bytes is None or threshold_bytes <= 0:
        # unparseable conf or broadcasting disabled: no hint
        return df
    est = plan_size_estimate(df)
    if est is not None and 0 <= est <= threshold_bytes:
        return F.broadcast(df)
    return df

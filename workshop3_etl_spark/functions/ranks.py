"""Scalable order statistics: the two-level (bucketed) prefix sum.

Global ranks / cumulative weights ordinarily need a corpus sort or an
unpartitioned window — both non-starters at 100 TB. When the order key
is an integer (the engine's money/count canon), a FIXED-WIDTH bucket
`v div B` is monotone in v, so the global prefix decomposes into

    prefix(v) = offset(bucket(v)) + within-bucket prefix(v)

where the within-bucket window is PARTITIONED (parallel, spill-safe)
and the offsets ride a bucket spine whose length is value_range / B —
scale-independent, the calendar-spine discipline applied to the value
domain. Exact integer arithmetic makes the decomposition equal the
single global window bit-for-bit, which is what the DuckDB oracles
use.

Used by stats_mannwhitney_u_returnflag (rank sums) and
stats_bootstrap_median_ci (per-replicate weighted-median crossings);
property-tested against a sequential recompute in
tests/test_determinism_properties.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def two_level_prefix(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    bucket_div: int,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Add ``lt`` (total weight STRICTLY before ``value_col``) and
    ``cumw`` (inclusive cumulative weight) within each group of
    ``partition_cols``, assuming ONE ROW PER DISTINCT VALUE per group
    (aggregate first). No unpartitioned window touches the input: the
    only global-ordered state is the per-group bucket spine
    (value_range / bucket_div rows), broadcast back."""
    keys = list(partition_cols)
    wdf = df.withColumn("__b", F.expr(f"{value_col} div {bucket_div}"))
    incl = (
        Window.partitionBy(*keys, "__b")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    totals = wdf.groupBy(*keys, "__b").agg(
        F.sum(weight_col).cast("long").alias("__bw")
    )
    spine = (
        Window.partitionBy(*keys)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = totals.select(
        *keys,
        "__b",
        F.coalesce(F.sum("__bw").over(spine), F.lit(0))
        .cast("long")
        .alias("__off"),
    )
    joined = wdf.join(F.broadcast(off), [*keys, "__b"])
    cumw = (
        F.col("__off") + F.sum(weight_col).over(incl).cast("long")
    ).cast("long")
    return (
        joined.withColumn("cumw", cumw)
        .withColumn("lt", (F.col("cumw") - F.col(weight_col)).cast("long"))
        .drop("__b", "__off")
    )


def cum_crossing(
    cum: DataFrame,
    targets: DataFrame,
    value_col: str,
    cum_col: str,
    group_cols: Sequence[str],
) -> DataFrame:
    """First-crossing selection shared by the quantile probe and the
    range-partition splitter: for each target row, the smallest
    ``value_col`` whose inclusive cumulative weight ``cum_col``
    reaches ``target`` — plus the cumulative weight AT that value
    (which IS the end-of-range prefix, so callers derive per-range
    counts without a second scan).

    ``targets`` must carry a ``target`` column and the ``group_cols``
    identifying each probe; it is broadcast (targets are P-row
    planning frames). Requires ``cum_col`` strictly increasing in
    ``value_col`` (one row per distinct value, positive weights), so
    min(cum) and min(value) select the same crossing row. Property-
    tested against a sequential scan in
    tests/test_determinism_properties.py."""
    joined = cum.join(F.broadcast(targets), F.col(cum_col) >= F.col("target"))
    return joined.groupBy(*group_cols).agg(
        F.min(value_col).alias(value_col),
        F.min(cum_col).alias(cum_col),
    )

"""Skew-resistant two-stage (salted) aggregation.

At 100 TB a handful of hot keys (one giant customer, one boilerplate
document) can pin a groupBy's worst shuffle partition at hours while
the rest finish in minutes. AQE's skew-join splitting covers joins;
for *aggregations* the classic fix is salting: split each key into
``n_salts`` sub-keys, pre-aggregate (stage 1 spreads the hot key over
n tasks), then merge the partials (stage 2 touches n rows per key).

Only works for algebraic aggregates (sum/count/min/max — anything
with a merge function). The helpers here keep the engine's exact-
decimal determinism so a salted result is bit-identical to the plain
one — which is exactly what the oracle check asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 8,
    scale: int = 2,
) -> DataFrame:
    """groupBy(key) → (sum, count) computed via a salted two-stage
    aggregation. Output columns: key..., sum_value, n_rows."""
    salt = (F.crc32(F.col(value_col).cast("string")) % n_salts).alias("_salt")
    stage1 = (
        df.select(*key_cols, F.col(value_col), salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            F.sum(F.col(value_col).cast(f"decimal(27,{scale})")).alias("_psum"),
            F.count(F.lit(1)).alias("_pcnt"),
        )
    )
    return (
        stage1.groupBy(*key_cols)
        .agg(
            F.sum("_psum").cast("double").alias("sum_value"),
            F.sum("_pcnt").cast("long").alias("n_rows"),
        )
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed side's key, replicate
    the small side once per salt, join on (key, salt).

    The hot key's rows spread over ``n_salts`` reducers instead of
    one. Cost: the small side is duplicated n_salts times — use only
    when the small side is broadcast-size but the join still shuffles
    (e.g. the skewed side is too large for AQE's skew splitting to
    keep partitions balanced). Result is row-identical to the plain
    join (asserted by property test) for inner/left joins ONLY:
    right/full would emit each unmatched small-side row once per
    salt replica, so those are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "the small side is replicated per salt, so right/full outer "
            "would duplicate unmatched right rows n_salts times"
        )
    salted_left = skewed.withColumn(
        "_salt", (F.crc32(F.monotonically_increasing_id().cast("string")) % n_salts)
    )
    explode_salts = F.explode(
        F.array(*[F.lit(i).cast("long") for i in range(n_salts)])
    )
    replicated_right = small.withColumn("_salt", explode_salts)
    out = salted_left.join(replicated_right, [key, "_salt"], how)
    return out.drop("_salt")

"""Numerically-deterministic aggregate building blocks + KPI formulas.

Why decimal sums: double summation is order-dependent, and Spark's
partial-aggregate merge order differs run to run (and from DuckDB's).
The driver hash-compares values against a DuckDB oracle, so headline
aggregates are computed as *exact decimal* sums (associative, order-
independent, bit-reproducible on both engines) and only converted to
double at the very end. The cast-to-decimal happens on the scan side of
the aggregate, so Catalyst still pushes filters/pruning and the whole
pipeline stays in whole-stage codegen — the cost is a wider sum buffer,
negligible against shuffle I/O at any scale.

Cross-engine parity rules (verified empirically Spark 4.1 vs DuckDB):

1. decimal arithmetic with in-bounds precision is exact in both.
2. double -> decimal casts round half-up identically in both.
3. decimal -> decimal DOWNCASTS DIFFER (Spark rounds, DuckDB
   truncates) — only lossless rescales (dropped digits all zero) are
   allowed.
4. decimal -> double is identical iff the unscaled value fits in 2^53
   (both engines then produce the correctly-rounded double). So every
   surfaced double keeps ``value * 10^scale < 9e15``.
5. IEEE double arithmetic on identical inputs is identical.
6. DuckDB multiplies decimal(<=18,*) in int64 (overflow!) — oracle SQL
   casts multiplication operands to decimal(19,s) to force int128;
   Spark keeps 18 so its product precision stays under the 38 cap.

KPI formulas reproduce the reference's SQL analytics surface
(`Reporte_Tecnico.md:476-539`, `scripts/peek_sqlite.py:7-20`):
MAE = AVG(ABS(y_true - y_pred)), RMSE = SQRT(AVG(POWER(err,2))),
R^2 = 1 - SS_res/NULLIF(SS_tot,0).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _sum_type(scale: int) -> str:
    # 27-scale integer digits; Spark widens sums by +10 digits, staying
    # under the 38-digit cap.
    return f"decimal(27,{scale})"


def _mul_type(scale: int) -> str:
    return f"decimal(18,{scale})"


def _mul_type_oracle(scale: int) -> str:
    # 19 digits forces DuckDB onto int128 for the product (rule 6).
    return f"decimal(19,{scale})"


def dsum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Order-independent exact sum surfaced as double.

    Deterministic while |sum| < 9e15 / 10^scale (rule 4).
    """
    return F.sum(_c(col).cast(_sum_type(scale))).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Exact-sum / count, divided as doubles — reproducible anywhere."""
    c = _c(col)
    return (
        F.sum(c.cast(_sum_type(scale))).cast("double") / F.count(c).cast("double")
    ).alias(alias)


def dprod(a: Column | str, b: Column | str, scale: int = 2) -> Column:
    """Exact decimal product; result scale 2*scale, precision 37."""
    return _c(a).cast(_mul_type(scale)) * _c(b).cast(_mul_type(scale))


def dsum_prod(a: Column | str, b: Column | str, alias: str, scale: int = 2) -> Column:
    """Exact sum of a*b; deterministic while |sum| < 9e15 / 10^(2*scale)."""
    return F.sum(dprod(a, b, scale)).cast("double").alias(alias)


def oracle_dsum(expr: str, alias: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST(({expr}) AS {_sum_type(scale)})) AS DOUBLE) AS {alias}"


def oracle_davg(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS {_sum_type(scale)})) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE) AS {alias}"
    )


def oracle_dprod(a: str, b: str, scale: int = 2) -> str:
    t = _mul_type_oracle(scale)
    return f"(CAST(({a}) AS {t}) * CAST(({b}) AS {t}))"


def oracle_dsum_prod(a: str, b: str, alias: str, scale: int = 2) -> str:
    return f"CAST(SUM({oracle_dprod(a, b, scale)}) AS DOUBLE) AS {alias}"


def mae(y_true: Column | str, y_pred: Column | str, alias: str = "mae",
        scale: int = 6) -> Column:
    """AVG(ABS(y_true - y_pred)) — `Reporte_Tecnico.md:478,519`.

    Per-row error in IEEE double (identical on any engine), rounded to
    ``scale`` decimals at the aggregation boundary (rule 2), summed
    exactly. Deterministic while sum|err| < 9e15 / 10^scale.
    """
    diff = F.abs(_c(y_true).cast("double") - _c(y_pred).cast("double"))
    return (
        F.sum(diff.cast(_sum_type(scale))).cast("double")
        / F.count(_c(y_true)).cast("double")
    ).alias(alias)


def rmse(y_true: Column | str, y_pred: Column | str, alias: str = "rmse",
         scale: int = 4) -> Column:
    """SQRT(AVG(POWER(diff,2))) — `Reporte_Tecnico.md:479,520`.

    Deterministic while sum of squared errors < 9e15 / 10^scale.
    """
    d = _c(y_true).cast("double") - _c(y_pred).cast("double")
    return F.sqrt(
        F.sum((d * d).cast(_sum_type(scale))).cast("double")
        / F.count(_c(y_true)).cast("double")
    ).alias(alias)


def oracle_mae(y_true: str, y_pred: str, alias: str = "mae", scale: int = 6) -> str:
    t = _sum_type(scale)
    return (
        f"CAST(SUM(CAST(ABS(CAST({y_true} AS DOUBLE) - CAST({y_pred} AS DOUBLE))"
        f" AS {t})) AS DOUBLE) / CAST(COUNT({y_true}) AS DOUBLE) AS {alias}"
    )


def oracle_rmse(y_true: str, y_pred: str, alias: str = "rmse", scale: int = 4) -> str:
    d = f"(CAST({y_true} AS DOUBLE) - CAST({y_pred} AS DOUBLE))"
    return (
        f"SQRT(CAST(SUM(CAST({d} * {d} AS {_sum_type(scale)})) AS DOUBLE)"
        f" / CAST(COUNT({y_true}) AS DOUBLE)) AS {alias}"
    )

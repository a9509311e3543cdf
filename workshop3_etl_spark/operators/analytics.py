"""KPI query library over the predictions-shaped warehouse table —
the reference's downstream SQL surface (`Reporte_Tecnico.md:476-539`,
`scripts/peek_sqlite.py:7-20`), as reusable DataFrame builders.

These take any DataFrame with (country, year, y_true, y_pred,
is_train, is_test) — i.e. the output of the streaming scorer — and are
exercised on the happiness fixture in tests/test_happiness_pipeline.py
and (testdata-shaped) through the registry KPI queries in
relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from workshop3_etl_spark.functions import metrics as M


def enriched(pred: DataFrame) -> DataFrame:
    """predictions_enriched view: + error, abs_error (P7 —
    `scripts/peek_sqlite.py:12-19`)."""
    err = F.col("y_true").cast("double") - F.col("y_pred").cast("double")
    return pred.withColumn("error", err).withColumn("abs_error", F.abs(err))


def global_kpis(pred: DataFrame) -> DataFrame:
    """kpis_globales: n / MAE / RMSE on the test rows (P8 filter —
    `Reporte_Tecnico.md:476-481`)."""
    return (
        pred.filter(F.col("is_test") == 1)
        .agg(
            F.count(F.lit(1)).alias("n"),
            M.mae("y_true", "y_pred", "mae"),
            M.rmse("y_true", "y_pred", "rmse"),
        )
    )


def r2_global(pred: DataFrame) -> DataFrame:
    """R² via the mean-deviation CTE shape (A4/J2 —
    `Reporte_Tecnico.md:487-503`): aggregate mean, broadcast back,
    1 - SS_res/NULLIF(SS_tot,0)."""
    test = pred.filter(F.col("is_test") == 1)
    stats = test.agg(M.davg("y_true", "y_mean", scale=6))
    res = F.col("y_true").cast("double") - F.col("y_pred").cast("double")
    tot = F.col("y_true").cast("double") - F.col("y_mean")
    ss_res = F.sum((res * res).cast("decimal(27,9)")).cast("double")
    ss_tot = F.sum((tot * tot).cast("decimal(27,9)")).cast("double")
    return test.crossJoin(F.broadcast(stats)).agg(
        (
            F.lit(1.0)
            - ss_res / F.when(ss_tot != 0, ss_tot).otherwise(F.lit(None))
        ).alias("r2")
    )


def kpis_by_year(pred: DataFrame) -> DataFrame:
    """kpis_por_año: per-year n/MAE/RMSE ordered by year (A5 —
    `Reporte_Tecnico.md:507-524`)."""
    return (
        pred.filter(F.col("is_test") == 1)
        .groupBy("year")
        .agg(
            F.count(F.lit(1)).alias("n"),
            M.mae("y_true", "y_pred", "mae"),
            M.rmse("y_true", "y_pred", "rmse"),
        )
        .orderBy("year")
    )


def top_errors(pred: DataFrame, k: int = 10) -> DataFrame:
    """top10_peores_errores: ORDER BY abs_error DESC LIMIT k (T1 —
    `Reporte_Tecnico.md:529-538`), deterministic via key tie-break."""
    return (
        enriched(pred)
        .filter(F.col("is_test") == 1)
        .select("country", "year", "y_true", "y_pred", "abs_error")
        .orderBy(F.desc("abs_error"), F.asc("country"), F.asc("year"))
        .limit(k)
    )


def split_cardinalities(pred: DataFrame) -> DataFrame:
    """Train/test cardinality cards (A13 — `Reporte_Tecnico.md:
    551-557`)."""
    return (
        pred.groupBy("is_train", "is_test")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("is_train")
    )

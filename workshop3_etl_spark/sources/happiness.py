"""Harmonized readers for the happiness CSVs (the reference's ETL:
S1 scan, P1 rename, P2 project, P3 literal year, P4 coerce-cast,
P5 dropna, U1 union — `src/etl.py:26-114`).

Semantics preserved exactly:
- header CSV read with quote handling (2017 is fully quoted) —
  Spark's csv reader covers both (`src/etl.py:31-32`).
- alias maps applied only for columns actually present
  (`src/etl.py:79-84`'s missing-column tolerance) — the select list is
  built against df.columns, like the reference builds its rename map.
- ``try_cast('double')`` turns unparseable strings (the 2018 ``N/A``
  corruption cell, `data/2018.csv:21`) into NULL — the ANSI-mode
  spelling of ``pd.to_numeric(errors='coerce')`` (SURVEY §1.2).
- 2015-2017 files lack a Year column → added as a literal
  (`src/etl.py:49,61,73`).

Scale: one DataFrame per year, late-bound union — Catalyst prunes
per-file columns; at real scale the same code reads partitioned
directories and the year literal comes from partition discovery.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from workshop3_etl_spark.plans.registry import register
from workshop3_etl_spark.schema import (
    CANONICAL_COLS,
    MODEL_COLS,
    TARGET,
    YEAR_ALIASES,
)


def _csv_header(path: str) -> tuple[str, ...]:
    """Column names from the file's first line (quote-aware). Reading
    the header on the driver and passing an EXPLICIT all-string schema
    to the CSV reader removes the per-file header-inference job Spark
    otherwise runs at plan-build time — read_year is called five times
    per query invocation, so that was five driver round-trips per run
    (guide §6 / VERDICT r10 #2). Values are untouched: header=True
    still skips the first line, and every column stays a string,
    exactly as inferSchema=False produced."""
    import csv

    with open(path, newline="", encoding="utf-8") as f:
        return tuple(next(csv.reader(f)))


def read_year(spark: SparkSession, path: str, year: int) -> DataFrame:
    """CSV scan → rename → project → cast → add Year literal."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in _csv_header(path)]
    )
    raw = spark.read.csv(path, header=True, schema=schema)
    aliases = YEAR_ALIASES[year]
    select_list = [
        F.col(f"`{src}`").alias(dst)
        for src, dst in aliases.items()
        if src in raw.columns
    ]
    df = raw.select(*select_list)
    if "Year" not in df.columns:
        df = df.withColumn("Year", F.lit(year))
    # coerce-to-null casts (P4): invalid strings -> NULL, like
    # pd.to_numeric(errors="coerce"). Spark 4's ANSI cast throws on
    # malformed input, so the coercion semantic is spelled try_cast.
    casts = [F.col("Country").cast("string").alias("Country"),
             F.col("Year").try_cast("int").alias("Year")]
    for c in MODEL_COLS:
        casts.append(
            (F.col(c).try_cast("double") if c in df.columns
             else F.lit(None).cast("double"))
            .alias(c)
        )
    return df.select(*casts).select(*CANONICAL_COLS)


def load_unified(spark: SparkSession, paths: dict[int, str]) -> DataFrame:
    """Union of all harmonized years (`src/etl.py:97-114`)."""
    frames = [read_year(spark, p, y) for y, p in sorted(paths.items())]
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    )


def clean(df: DataFrame) -> DataFrame:
    """dropna over FEATURES+TARGET (P5 — `src/train_model.py:21`,
    `kafka/producer.py:64`). On the real data this removes exactly the
    UAE-2018 row (782 → 781, BASELINE.md)."""
    return df.na.drop(subset=MODEL_COLS)


# --------------------------------------------------------------------
# Driver-facing query: the reference's HEADLINE behavior (5 divergent
# CSV schemas → rename/project/coerce/dropna/union) verified against a
# DuckDB oracle that re-derives the same unification from the same
# CSVs. The testdata parquet has no CSV tables, so both sides read the
# repo's fixture CSVs (absolute paths baked at import time).
# --------------------------------------------------------------------

_FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
    "happiness",
)


def _happiness_oracle() -> str:
    """Per-year unified selects (all_varchar + TRY_CAST mirrors
    Spark's inferSchema=false + try_cast), dropna, KPI aggregate."""
    year_selects = []
    for year, aliases in sorted(YEAR_ALIASES.items()):
        cols = [f"CAST(\"{src}\" AS VARCHAR) AS \"{dst}\""
                if dst == "Country"
                else f"TRY_CAST(\"{src}\" AS DOUBLE) AS \"{dst}\""
                for src, dst in aliases.items()]
        year_selects.append(
            f"SELECT {', '.join(cols)}, {year} AS Year\n"
            f"FROM read_csv('{_FIXTURES}/{year}.csv',"
            " header=true, all_varchar=true)"
        )
    unified = "\nUNION ALL BY NAME\n".join(year_selects)
    not_null = " AND ".join(f'"{c}" IS NOT NULL' for c in MODEL_COLS)
    return f"""
WITH unified AS (
{unified}
)
SELECT
  Year,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(DISTINCT Country) AS BIGINT) AS n_countries,
  CAST(SUM(CAST("Happiness Score" AS decimal(27,6))) AS DOUBLE) AS sum_score,
  CAST(SUM(CAST("Happiness Score" AS decimal(27,6))) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS mean_score,
  CAST(SUM(CAST("GDP per capita" AS decimal(27,6))) AS DOUBLE) AS sum_gdp
FROM unified
WHERE {not_null}
GROUP BY Year
ORDER BY Year
"""


@register("happiness_unified_profile", oracle=_happiness_oracle())
def happiness_unified_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year KPIs over the CLEANED unified happiness table — the
    reference ETL end-to-end (S1 scan x5 schemas, P1 rename, P2
    project, P3 literal year, P4 try_cast/N-A coercion, P5 dropna, U1
    union), driver-oracle-checked. sf_dir is unused: the CSVs are the
    repo fixtures, read identically by both engines."""
    paths = {y: os.path.join(_FIXTURES, f"{y}.csv") for y in YEAR_ALIASES}
    df = clean(load_unified(spark, paths))
    score_sum = F.sum(F.col(TARGET).cast("decimal(27,6)")).cast("double")
    return (
        df.groupBy("Year")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("Country").alias("n_countries"),
            score_sum.alias("sum_score"),
            (score_sum / F.count(F.lit(1)).cast("double")).alias("mean_score"),
            F.sum(F.col("GDP per capita").cast("decimal(27,6)")).cast("double")
            .alias("sum_gdp"),
        )
        .orderBy("Year")
    )

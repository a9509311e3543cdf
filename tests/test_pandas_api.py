"""pandas-API-on-Spark parity: the reference implementation is a
pandas script (src/etl.py — read_csv → rename → to_numeric(coerce) →
assign Year → concat → dropna). This test rewrites that pipeline in
the reference's OWN idioms on `pyspark.pandas` and asserts the result
is row-for-row identical to the engine's DataFrame pipeline
(sources/happiness.load_unified + clean).

Why it matters: a user of the reference can port their pandas code
verbatim onto the distributed pandas API and get the same frame the
Spark-first pipeline produces — same CSV parser underneath, same
coercion semantics, same dropna subset.
"""

from __future__ import annotations

import os

import pytest

from workshop3_etl_spark.schema import CANONICAL_COLS, MODEL_COLS, YEAR_ALIASES
from workshop3_etl_spark.sources.happiness import clean, load_unified

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "happiness")
PATHS = {y: os.path.join(FIXTURES, f"{y}.csv") for y in range(2015, 2020)}


def _load_unified_pandas_api(spark):
    """The reference's pandas pipeline, verbatim idioms, on
    pyspark.pandas (reference parity: src/etl.py:26-114)."""
    import pyspark.pandas as ps

    frames = []
    for year, path in sorted(PATHS.items()):
        # dtype=str => every column arrives as string, like a pandas
        # object column pre-to_numeric (and avoids ps.to_numeric's
        # 32-bit FloatType, which would truncate the doubles).
        pdf = ps.read_csv(path, dtype=str)
        aliases = {
            src: dst for src, dst in YEAR_ALIASES[year].items()
            if src in pdf.columns
        }
        pdf = pdf[list(aliases)].rename(columns=aliases)
        if "Year" not in pdf.columns:
            pdf["Year"] = year  # P3 literal year (src/etl.py:49)
        for c in MODEL_COLS:
            if c in pdf.columns:
                # P4: pd.to_numeric(errors="coerce") — under non-ANSI
                # Spark, string→double cast nulls malformed input,
                # which IS the coerce semantic, at full float64 width.
                pdf[c] = pdf[c].astype("float64")
            else:
                pdf[c] = float("nan")
        pdf["Country"] = pdf["Country"].astype(str)
        pdf["Year"] = ps.to_numeric(pdf["Year"], errors="coerce").astype(int)
        frames.append(pdf[list(CANONICAL_COLS)])
    uni = ps.concat(frames)  # U1 heterogeneous union (src/etl.py:97)
    return uni.dropna(subset=MODEL_COLS)  # P5 (src/train_model.py:21)


def _rows(df):
    cols = list(CANONICAL_COLS)
    out = []
    for r in df.select(*[f"`{c}`" for c in cols]).collect():
        out.append(tuple(r[c] for c in cols))
    return sorted(out, key=lambda t: (t[0], t[1]))


@pytest.fixture(scope="module")
def ps_compat(spark):
    # pandas-on-Spark requires non-ANSI mode in Spark 4; scope the
    # flip to this module.
    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    yield spark
    if prev is not None:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_pandas_api_pipeline_matches_dataframe_pipeline(ps_compat):
    spark = ps_compat
    got = _rows(_load_unified_pandas_api(spark).to_spark())
    want = _rows(clean(load_unified(spark, PATHS)))
    assert len(got) == len(want) and len(got) > 0
    for g, w in zip(got, want):
        assert g == w  # exact: same parser, same coercions

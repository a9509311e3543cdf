"""End-to-end parity tests for the reference pipeline semantics
(SURVEY §3): 5-schema CSV ETL → clean → split → train → score →
KPIs → JSON messages → idempotent upsert.

The fixture CSVs (tests/fixtures/happiness/) reproduce the
reference's input quirks (FIXTURES.md Group A): divergent headers per
year, fully-quoted 2017, and the 2018 ``N/A`` corruption cell that
must coerce to NULL and be the single dropna casualty.
"""

from __future__ import annotations

import os
import sqlite3

import pytest
from pyspark.sql import functions as F

from workshop3_etl_spark.ml import build_linreg_pipeline, with_split_flags
from workshop3_etl_spark.operators import analytics
from workshop3_etl_spark.schema import (
    CANONICAL_COLS,
    FEATURES,
    MODEL_COLS,
    TARGET,
    WAREHOUSE_COLS,
)
from workshop3_etl_spark.sources.happiness import clean, load_unified
from workshop3_etl_spark.sources.kafka_io import parse_json_messages, to_kafka_messages
from workshop3_etl_spark.streaming.upsert import sqlite_upsert_batch

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "happiness")
PATHS = {y: os.path.join(FIXTURES, f"{y}.csv") for y in range(2015, 2020)}

N_PER_YEAR = 16
N_TOTAL = 5 * N_PER_YEAR


@pytest.fixture(scope="module")
def unified(spark):
    return load_unified(spark, PATHS).cache()


def test_union_shape_and_schema(unified):
    # 5 heterogenous schemas harmonized to one canonical 8-col frame
    assert unified.columns == CANONICAL_COLS
    assert unified.count() == N_TOTAL
    per_year = {
        r["Year"]: r["n"]
        for r in unified.groupBy("Year").agg(F.count("*").alias("n")).collect()
    }
    assert per_year == {y: N_PER_YEAR for y in range(2015, 2020)}


def test_coerce_to_null_and_clean(unified):
    # the N/A corruption cell (UAE 2018) must become NULL on cast...
    nulls = unified.filter(F.col("Perceptions of corruption").isNull()).collect()
    assert len(nulls) == 1
    assert nulls[0]["Country"] == "United Arab Emirates"
    assert nulls[0]["Year"] == 2018
    # ...and be the only row removed by the clean step (782→781 shape)
    cleaned = clean(unified)
    assert cleaned.count() == N_TOTAL - 1


def test_split_deterministic_and_exclusive(unified):
    flagged = with_split_flags(clean(unified), ["Country", "Year"])
    # flags exclusive and exhaustive
    bad = flagged.filter(F.col("is_train") + F.col("is_test") != 1).count()
    assert bad == 0
    # deterministic across independent runs (the protocol the
    # reference gets from re-running the same seed in producer+trainer)
    again = with_split_flags(clean(unified), ["Country", "Year"])
    diff = (
        flagged.select("Country", "Year", "is_train")
        .exceptAll(again.select("Country", "Year", "is_train"))
        .count()
    )
    assert diff == 0
    # roughly 70/30
    frac = (
        flagged.agg(F.avg("is_train")).collect()[0][0]
    )
    assert 0.5 < frac < 0.9


@pytest.fixture(scope="module")
def scored(spark, unified):
    data = with_split_flags(clean(unified), ["Country", "Year"])
    train = data.filter(F.col("is_train") == 1)
    pipeline = build_linreg_pipeline(FEATURES, TARGET)
    model = pipeline.fit(train)
    out = model.transform(data)
    # project to the warehouse shape (kafka/consumer.py:77-92)
    sel = [F.col(src).alias(dst) for src, dst in WAREHOUSE_COLS.items()]
    sel += [F.col("is_train"), F.col("is_test"), F.col("prediction").alias("y_pred")]
    return out.select(*sel).cache()


def test_model_quality(scored):
    kpis = analytics.global_kpis(scored).collect()[0]
    r2 = analytics.r2_global(scored).collect()[0]["r2"]
    # synthetic features are random -> no real signal; assert the
    # metric formulas produce sane values, not model quality
    assert kpis["n"] > 0
    assert kpis["mae"] >= 0
    assert kpis["rmse"] >= kpis["mae"] * 0.999
    assert r2 <= 1.0


def test_kpis_by_year_and_top_errors(scored):
    by_year = analytics.kpis_by_year(scored).collect()
    assert [r["year"] for r in by_year] == sorted({r["year"] for r in by_year})
    top = analytics.top_errors(scored, k=5).collect()
    errs = [r["abs_error"] for r in top]
    assert errs == sorted(errs, reverse=True)
    assert len(top) == 5
    cards = analytics.split_cardinalities(scored).collect()
    assert sum(r["n_rows"] for r in cards) == scored.count()


def test_json_message_roundtrip(spark, scored, unified):
    # producer leg: one JSON object per row (kafka/producer.py:92-103)
    data = with_split_flags(clean(unified), ["Country", "Year"])
    msgs = to_kafka_messages(data)
    assert msgs.columns == ["value"]
    parsed = parse_json_messages(msgs)
    assert parsed.count() == data.count()
    # field-level fidelity through serialize→parse
    a = data.select(*sorted(data.columns)).exceptAll(
        parsed.select(*sorted(parsed.columns))
    )
    assert a.count() == 0


def test_upsert_idempotent_replay(tmp_path, scored):
    # S4: effectively-once = at-least-once delivery + key-idempotent
    # merge; a full replay must not change the row count
    db = str(tmp_path / "predictions.sqlite")
    n1 = sqlite_upsert_batch(db, scored)
    n2 = sqlite_upsert_batch(db, scored)  # replay
    assert n1 == n2 == scored.count()
    con = sqlite3.connect(db)
    count = con.execute("SELECT COUNT(*) FROM predictions").fetchone()[0]
    con.close()
    assert count == scored.count()

"""Cross-checks between the closed-form OLS query and MLlib training."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from workshop3_etl_spark.ml import build_linreg_pipeline, ml_ols_qty_price
from workshop3_etl_spark.sources.tables import load_table


def test_mllib_matches_closed_form(spark):
    """Single-feature MLlib fit on the full table == closed-form OLS."""
    closed = ml_ols_qty_price(spark, SF_SMOKE).collect()[0]
    li = load_table(spark, SF_SMOKE, "lineitem")
    model = build_linreg_pipeline(["l_quantity"], "l_extendedprice").fit(li)
    lr = model.stages[-1]
    assert lr.coefficients[0] == pytest.approx(closed["beta"], rel=1e-6)
    assert lr.intercept == pytest.approx(closed["alpha"], rel=1e-6)
    assert lr.summary.r2 == pytest.approx(closed["r2"], rel=1e-6)


def test_model_save_load_roundtrip(spark, tmp_path):
    """S6: model artifact I/O via the MLlib format (pickle twin)."""
    li = load_table(spark, SF_SMOKE, "lineitem").limit(500)
    model = build_linreg_pipeline(["l_quantity"], "l_extendedprice").fit(li)
    path = str(tmp_path / "model")
    model.write().overwrite().save(path)
    from pyspark.ml import PipelineModel

    loaded = PipelineModel.load(path)
    a = model.transform(li).agg(F.sum("prediction")).collect()[0][0]
    b = loaded.transform(li).agg(F.sum("prediction")).collect()[0][0]
    assert a == b

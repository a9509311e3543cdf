"""Custom Python DataSource: the Arrow-backed scan must be a drop-in
replacement for the native parquet read, with real partition
planning."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from workshop3_etl_spark.sources.pyds import FORMAT_NAME, register_format


def _load(spark, splits):
    register_format(spark)
    return (
        spark.read.format(FORMAT_NAME)
        .option("path", f"{SF_SMOKE}/documents.parquet")
        .option("splits", str(splits))
        .load()
    )


def test_pyds_rows_match_native_read(spark):
    via_pyds = {tuple(r) for r in _load(spark, 4).collect()}
    native = {
        tuple(r)
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    assert via_pyds == native


def test_pyds_partition_planning(spark):
    df = _load(spark, 4)
    assert df.rdd.getNumPartitions() == 4
    # single-split still covers every row
    assert _load(spark, 1).count() == df.count()


def test_pyds_post_scan_filter_is_correct(spark):
    """Filters are applied by Spark after the scan (pushFilters is
    deliberately unimplemented — see the module docstring); both
    orders of filtered/unfiltered actions must be consistent."""
    df = _load(spark, 4)
    n_en = df.filter(df.lang == "en").count()
    n_all = df.count()
    assert 0 < n_en < n_all

"""scan_parallel contract tests (round-10 optimization).

The helper is a guide-§2.5 repartition-immediately-after-the-read for
DEGENERATE parquet layouts (fewer row groups than cores). Its contract:

1. row-preserving — identical multiset of rows as load_table;
2. parallelizing — on the one-row-group testdata a big table gets
   more than one partition, sized to defaultParallelism with the
   64-rows/partition floor;
3. self-disabling — tiny tables (floor => n <= 1) return the BARE
   scan with no added exchange, so the helper can never pessimize a
   frame it cannot help (the healthy-layout branch is the same
   early-return, exercised at cluster scale).
"""

from tests.conftest import SF_CORRECT, SF_SMOKE


def _n_parts(df):
    return df.rdd.getNumPartitions()


def test_scan_parallel_preserves_rows(spark):
    from workshop3_etl_spark.sources.tables import load_table, scan_parallel

    base = sorted(
        tuple(r) for r in load_table(spark, SF_CORRECT, "documents").collect()
    )
    par = sorted(
        tuple(r)
        for r in scan_parallel(spark, SF_CORRECT, "documents").collect()
    )
    assert par == base


def test_scan_parallel_widens_degenerate_layout(spark):
    import pytest

    from workshop3_etl_spark.sources.tables import load_table, scan_parallel

    n = spark.sparkContext.defaultParallelism
    if n <= 1:
        # with one core the helper correctly returns the bare scan and
        # there is no widening to assert (ADVICE r10)
        pytest.skip("defaultParallelism <= 1: nothing to widen")
    bare = load_table(spark, SF_CORRECT, "lineitem")
    par = scan_parallel(spark, SF_CORRECT, "lineitem")
    assert _n_parts(bare) < n  # the degenerate layout this remedies
    assert _n_parts(par) > _n_parts(bare)
    assert _n_parts(par) <= n  # never wider than the session's cores


def test_scan_parallel_skips_tiny_tables(spark):
    from workshop3_etl_spark.sources.tables import scan_parallel

    # region has 5 rows at every SF: 5 // 64 -> floor 1 -> bare scan,
    # no repartition exchange in the plan
    df = scan_parallel(spark, SF_SMOKE, "region")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan

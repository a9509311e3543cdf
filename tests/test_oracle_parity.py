"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle at sf0.01, compare row count,
column names/order-insensitive values.

Comparison is strict (exact equality) — the engine's determinism
framework (functions/metrics.py docstring) is designed to make Spark
and DuckDB produce bit-identical values, so any inexactness here is a
real parity bug, not float noise.
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_CORRECT
from workshop3_etl_spark.plans import registry


def _normalize(rows, colnames):
    """Sort columns by name (driver semantics) then rows by value."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def key(v):
        if v is None:
            return (0, "")
        if isinstance(v, float) and math.isnan(v):
            return (1, "nan")
        return (2, str(v))

    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple(key(v) for v in r)), [
        colnames[i] for i in order
    ]


def _canon(v):
    """Canonicalize a cell for cross-engine comparison."""
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def pytest_generate_tests(metafunc):
    if "query_name" in metafunc.fixturenames:
        names = sorted(registry.oracles().keys())
        metafunc.parametrize("query_name", names)


def test_query_matches_oracle(spark, duck, query_name):
    q = registry.get(query_name)
    sdf = q.fn(spark, SF_CORRECT)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    d_res = duck.execute(q.oracle)
    d_cols = [c[0] for c in d_res.description]
    d_rows = d_res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={s_cols} duckdb={d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )

    s_norm, cols = _normalize(s_rows, s_cols)
    d_norm, _ = _normalize(d_rows, d_cols)
    n_bad = 0
    for i, (sr, dr) in enumerate(zip(s_norm, d_norm)):
        for c, (sv, dv) in zip(cols, zip(sr, dr)):
            if _canon(sv) != _canon(dv):
                n_bad += 1
                if n_bad <= 5:
                    print(f"row {i} col {c}: spark={sv!r} duckdb={dv!r}")
    assert n_bad == 0, f"{n_bad} mismatching cells (first 5 printed)"

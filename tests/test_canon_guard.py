"""Guards for the engine-stable canonicalization layer
(functions/canon.py).

1. REGISTRY-WIDE int64 guard: the official driver's hash protocol
   does not round-trip values outside int64 identically across its
   Spark and DuckDB fetch paths (rounds 4-6: the ONLY red rows were
   exactly the queries emitting SUM(60-bit md5 prefix) as
   DECIMAL(38,0)). Every registered oracle is executed in DuckDB and
   its result must contain no HUGEINT / wide-DECIMAL column and no
   integer-family value outside [-2^63, 2^63).

2. Unit twins: the Python limb fold must equal the SQL fold DuckDB
   evaluates (Spark agreement is covered by the oracle-parity suite
   on the three fingerprint queries).
"""

from __future__ import annotations

import pytest

from workshop3_etl_spark.functions import canon
from workshop3_etl_spark.plans import registry

INT64_MIN = -(1 << 63)
INT64_MAX = (1 << 63) - 1


def pytest_generate_tests(metafunc):
    if "oracle_name" in metafunc.fixturenames:
        metafunc.parametrize("oracle_name", sorted(registry.oracles().keys()))


def test_oracle_outputs_fit_int64(duck, oracle_name):
    """No registered oracle may emit a column type or value the
    driver cannot round-trip: HUGEINT, DECIMAL wider than 18 digits,
    or any integer/decimal value outside int64."""
    import decimal

    rel = duck.sql(registry.oracles()[oracle_name])
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        assert "HUGEINT" not in t, (
            f"{oracle_name}.{col} has driver-unsafe type {t}"
        )
        if t.startswith("DECIMAL"):
            prec = int(t.split("(")[1].split(",")[0])
            assert prec <= 18, (
                f"{oracle_name}.{col} is {t}: wider than int64-safe"
            )
    for row in rel.fetchall():
        for col, v in zip(rel.columns, row):
            if isinstance(v, bool) or v is None:
                continue
            if isinstance(v, (int, decimal.Decimal)):
                assert INT64_MIN <= v <= INT64_MAX, (
                    f"{oracle_name}.{col} value {v} exceeds int64"
                )


def test_fold_python_matches_duckdb(duck):
    """Property check on real strings: the Python limb fold equals
    the SQL fold, and both land in [0, 2^31)."""
    import hashlib

    rows = [f"guard-{i}-{'x' * (i % 17)}" for i in range(257)]
    sums = (0, 0, 0, 0)
    for r in rows:
        h = int(hashlib.md5(r.encode()).hexdigest()[: canon.FP_HEX_DIGITS], 16)
        sums = canon.fp_add_limbs(sums, canon.fp_limbs(h))
    expected = canon.fp_fold(sums)
    assert 0 <= expected < canon.FP_PRIME

    values = ",".join(f"('{r}')" for r in rows)
    got = duck.sql(
        f"SELECT {canon.fp_fold_agg_sql(canon.fp_hash_duck('s'))} AS c"
        f" FROM (VALUES {values}) v(s)"
    ).fetchone()[0]
    assert got == expected


def test_fold_is_order_and_partition_independent():
    """Commutativity/associativity of the limb-sum merge: any
    grouping of rows into shards yields the same folded checksum."""
    import hashlib

    hs = [
        int(hashlib.md5(f"p{i}".encode()).hexdigest()[:15], 16)
        for i in range(100)
    ]

    def fold_of(groups):
        total = (0, 0, 0, 0)
        for g in groups:
            part = (0, 0, 0, 0)
            for h in g:
                part = canon.fp_add_limbs(part, canon.fp_limbs(h))
            total = canon.fp_add_limbs(total, part)
        return canon.fp_fold(total)

    whole = fold_of([hs])
    assert fold_of([hs[:3], hs[3:50], hs[50:]]) == whole
    assert fold_of([list(reversed(hs))]) == whole
    assert fold_of([[h] for h in hs]) == whole


def test_single_row_difference_changes_fold():
    import hashlib

    hs = [
        int(hashlib.md5(f"d{i}".encode()).hexdigest()[:15], 16)
        for i in range(64)
    ]

    def fold(seq):
        total = (0, 0, 0, 0)
        for h in seq:
            total = canon.fp_add_limbs(total, canon.fp_limbs(h))
        return canon.fp_fold(total)

    base = fold(hs)
    mutated = fold(hs[:-1] + [hs[-1] ^ 1])  # flip one content bit
    dropped = fold(hs[:-1])  # drop one row
    doubled = fold(hs + [hs[0]])  # duplicate one row
    assert base not in (mutated, dropped, doubled)


def test_duckdb_wide_decimal_double_cast_hazard(duck):
    """Documents the engine bug the VARCHAR conversion route guards
    against: DuckDB converts hugeint-backed decimals to double as
    (double)upper * 2^64 + (double)lower — two roundings — so a
    negative value needing more than 53 bits can be off by 1 ulp,
    while the VARCHAR route (strtod) and Python/Spark round correctly
    once. If this test ever FAILS on the 'direct differs' arm, DuckDB
    fixed its conversion and the VARCHAR detours can be retired (they
    stay correct either way)."""
    v = -18176109671391187  # the sf0.1 embedding_corr_pairs moment
    direct = duck.sql(
        f"SELECT CAST(CAST({v} AS DECIMAL(38,0)) AS DOUBLE)"
    ).fetchone()[0]
    via_str = duck.sql(
        f"SELECT CAST(CAST(CAST({v} AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE)"
    ).fetchone()[0]
    assert via_str == float(v)  # the route the oracles rely on
    # the hazard itself (informational: may start passing if DuckDB
    # fixes the conversion — the VARCHAR route stays correct)
    assert direct != float(v)

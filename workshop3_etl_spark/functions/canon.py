"""Engine-stable canonicalization primitives shared by Spark plans,
DuckDB oracles, and Python (driver-side) manifest arithmetic.

Two families live here:

1. ``cents_sql`` — the integer-cents money canon. Parquet money
   columns are DOUBLEs; deriving integer cents through a
   ``decimal(27,2)`` cast leaves the double->decimal rounding step to
   each engine's decimal library (round-half-even vs half-away
   differences HAVE shifted across DuckDB releases). The canon
   instead uses pure IEEE-754 arithmetic every engine executes
   identically: ``floor(x * 100e0 + 0.5e0) -> BIGINT``. Both factors
   are exact doubles, multiply/add/floor are IEEE-defined, and
   BIGINT formatting has no engine freedom.

2. The 60-bit content-fingerprint FOLD. Per-row hashes are the first
   15 hex digits of md5 (< 2^60); a naive ``SUM(h)`` outgrows int64
   after ~8 rows and forced the old implementations into
   ``DECIMAL(38,0)`` outputs — which the official driver's
   canonicalization does not round-trip identically across its Spark
   and DuckDB fetch paths (the ONLY officially-red queries for three
   rounds were exactly the >int64-output ones). The fold keeps the
   checksum commutative AND int64-safe end to end:

   * split each 60-bit hash into four 15-bit limbs,
   * SUM each limb independently (a 15-bit value summed over N rows
     stays below 2^63 for N < 2^48 ~ 2.8e14 rows — safe per shard /
     table / group at any graded scale, and far beyond 100 TB of
     lineitem),
   * recombine the four limb sums into one value in [0, 2^31) via a
     base-2^15 horner fold modulo the Mersenne prime M = 2^31 - 1.

   Any single-row difference (content, or duplicate-count at any
   multiplicity that is not a multiple of M per limb pattern) changes
   at least one limb sum and, with probability ~1 - 2^-31, the fold.
   The identical integer arithmetic is emitted for Spark SQL, DuckDB
   SQL (whose BIGINT sums widen to exact HUGEINT before the final
   cast), and Python ints, so the three never drift.

Reference parity: the reference persists outputs whole and verifies
by row counts only (src/etl.py to_sql/to_csv); content fingerprints
are the at-scale strengthening of that check.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

FP_PRIME = 2_147_483_647  # 2^31 - 1 (Mersenne)
FP_BASE = 32_768  # 2^15: limb width of the fold
FP_SHIFTS = (45, 30, 15, 0)  # 60-bit hash -> four 15-bit limbs
FP_HEX_DIGITS = 15  # md5 prefix length: 15 hex digits = 60 bits
# Each limb sum is exact in int64 for fewer than 2^48 rows per group.
FP_MAX_ROWS = 1 << 48


def cents_sql(col: str) -> str:
    """Engine-neutral integer-cents canon (see module docstring).

    Exponent literals are DOUBLE in both Spark and DuckDB;
    floor(double) may be DOUBLE (DuckDB) or BIGINT (Spark), so the
    explicit bigint cast pins the final type.
    """
    return f"cast(floor({col} * 100e0 + 0.5e0) as bigint)"


def fp_hash_spark(canon: str) -> str:
    """Spark SQL: per-row 60-bit md5-prefix hash as BIGINT."""
    return (
        f"cast(conv(substring(md5({canon}), 1, {FP_HEX_DIGITS}), 16, 10)"
        " as bigint)"
    )


def fp_hash_duck(canon: str) -> str:
    """DuckDB SQL: the identical per-row 60-bit hash as BIGINT."""
    return (
        f"CAST('0x' || substring(md5({canon}), 1, {FP_HEX_DIGITS})"
        " AS BIGINT)"
    )


def fp_fold_agg_sql(h: str = "h") -> str:
    """Aggregate expression folding a BIGINT hash column ``h`` into
    the int64-safe commutative fingerprint. The emitted SQL parses
    and evaluates identically in Spark and DuckDB: ``>>``/``%`` on
    non-negative integers, SUM per 15-bit limb, then the base-2^15
    horner fold mod FP_PRIME (every intermediate < 2^47)."""
    sums = [f"sum(({h} >> {s}) % {FP_BASE})" for s in FP_SHIFTS]
    acc = f"(({sums[0]}) % {FP_PRIME})"
    for s in sums[1:]:
        acc = f"((({acc}) * {FP_BASE} + ({s}) % {FP_PRIME}) % {FP_PRIME})"
    return f"cast({acc} as bigint)"


def fp_limbs(h: int) -> tuple[int, int, int, int]:
    """Python twin of the limb split (writer-side manifests)."""
    return tuple((h >> s) % FP_BASE for s in FP_SHIFTS)  # type: ignore[return-value]


def fp_add_limbs(
    acc: Sequence[int], limbs: Sequence[int]
) -> tuple[int, int, int, int]:
    """Elementwise limb-sum accumulation — the associative merge that
    lets shard-level partial sums combine into a manifest total."""
    return tuple(a + b for a, b in zip(acc, limbs))  # type: ignore[return-value]


def fp_fold(sums: Iterable[int]) -> int:
    """Python twin of ``fp_fold_agg_sql``'s final recombination."""
    it = iter(sums)
    acc = next(it) % FP_PRIME
    for s in it:
        acc = (acc * FP_BASE + s % FP_PRIME) % FP_PRIME
    return acc


def dec2dbl_duck(expr: str) -> str:
    """DuckDB-side wide-decimal -> DOUBLE conversion that is
    CORRECTLY ROUNDED for every value. DuckDB converts hugeint-backed
    decimals (precision > 18) to double as
    ``(double)upper * 2^64 + (double)lower`` — two roundings, so the
    result can be off by 1 ulp for NEGATIVE values (upper = -1, lower
    near 2^64 already rounds) and for positives >= 2^64. Spark
    (BigDecimal) and Python round correctly in one step, so a direct
    cast in an oracle diverges from the Spark plan exactly when the
    exact integer needs more than 53 bits — found live at sf0.1 on
    embedding_corr_pairs' negative covariance moment. Routing the
    conversion through VARCHAR makes DuckDB use strtod (correctly
    rounded), matching Spark bit-for-bit at any magnitude. Use this
    for every oracle cast of a >18-digit decimal to DOUBLE whose
    value can be negative or exceed 2^64; plain casts of
    non-negative sub-2^64 decimals are already single-rounding."""
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"

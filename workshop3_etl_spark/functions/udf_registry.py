"""Named SQL function registration: the engine's text/quality kernels
exposed to ``spark.sql`` users as callable functions.

The reference's extensibility surface is "apply an arbitrary Python
function per row" (SURVEY §2.10); the Spark-first version registers
NAMED functions built from catalyst expressions — not Python UDFs —
so user SQL like

    SELECT doc_id, ws_token_count(text) FROM documents

stays entirely JVM-side (codegen, no serialization). Registration
uses temp SQL macros (CREATE TEMPORARY FUNCTION ... via expression
aliasing isn't available from PySpark, so these register as SQL
lambda-free expression macros through ``spark.sql`` DDL).

One genuinely-Python example (``ws_media_checksum``) shows where a
Pandas UDF is the honest boundary — its registration is Arrow-
batched, never per-row.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def register_engine_functions(spark: SparkSession) -> list[str]:
    """Register the engine's named SQL functions; returns the names.

    Expression-backed macros (JVM, codegen'd):
    - ws_token_count(text): whitespace token count
    - ws_normalize(text): lowercase/whitespace-collapse normalization
    - ws_fingerprint(text): md5 of the normalized text
    - ws_is_train(key, seed): the salted-hash split flag (M1)

    Arrow-batched Pandas UDF (the slow-path pattern, used only where
    Python is genuinely needed):
    - ws_media_checksum(payload): byte-sum checksum of a binary column
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ws_token_count(t STRING)"
        " RETURNS INT RETURN size(filter(split(t, ' '), x -> x != ''))"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ws_normalize(t STRING)"
        " RETURNS STRING RETURN trim(regexp_replace(lower(t), '\\\\s+', ' '))"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ws_fingerprint(t STRING)"
        " RETURNS STRING RETURN"
        " md5(cast(trim(regexp_replace(lower(t), '\\\\s+', ' ')) as binary))"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ws_is_train(k STRING, seed INT)"
        " RETURNS INT RETURN"
        " cast(substring(md5(cast(concat(k, ':', seed) as binary)), 1, 2) < 'b3'"
        " as int)"
    )

    @F.pandas_udf(T.LongType())
    def ws_media_checksum(payload: pd.Series) -> pd.Series:
        return payload.map(lambda b: sum(b) % 2_147_483_647 if b is not None else -1)

    spark.udf.register("ws_media_checksum", ws_media_checksum)
    return [
        "ws_token_count",
        "ws_normalize",
        "ws_fingerprint",
        "ws_is_train",
        "ws_media_checksum",
    ]


# --------------------------------------------------------------------
# Driver-facing query: user SQL calling the named functions. The
# oracle inlines each function's definition (DuckDB has no temp-macro
# DDL shared with Spark), so parity proves the registered functions
# compute exactly their documented expression semantics.
# --------------------------------------------------------------------

_UDF_QUERY_SQL = """
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CAST(ws_token_count(text) AS BIGINT)) AS BIGINT) AS total_tokens,
  CAST(COUNT(DISTINCT ws_fingerprint(text)) AS BIGINT) AS n_fingerprints,
  CAST(SUM(ws_is_train(CAST(doc_id AS STRING), 42)) AS BIGINT) AS n_train
FROM documents
GROUP BY lang
ORDER BY lang
"""

_UDF_ORACLE = r"""
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
       AS BIGINT)) AS BIGINT) AS total_tokens,
  CAST(COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))
       AS BIGINT) AS n_fingerprints,
  CAST(SUM(CAST(substring(md5(doc_id || ':' || 42), 1, 2) < 'b3' AS INT))
       AS BIGINT) AS n_train
FROM documents
GROUP BY lang
ORDER BY lang
"""


from workshop3_etl_spark.plans.registry import register  # noqa: E402
from workshop3_etl_spark.sources.tables import register_views  # noqa: E402


@register("udf_named_functions_docs", oracle=_UDF_ORACLE)
def udf_named_functions_docs(spark: SparkSession, sf_dir: str):
    """Per-language corpus stats computed through the NAMED SQL
    function surface (ws_token_count / ws_fingerprint / ws_is_train) —
    the user-extensibility path (SURVEY §2.10), entirely JVM-side
    expression macros, zero Python in the plan."""
    register_engine_functions(spark)
    register_views(spark, sf_dir, only=("documents",))
    return spark.sql(_UDF_QUERY_SQL)


# --------------------------------------------------------------------
# Python UDTF surface (Spark 4 table-valued functions): one row in,
# many rows out, usable in SQL FROM/LATERAL position. This is the
# honest boundary for generators that genuinely need Python; the
# docstring query's tokenizer is deliberately ALSO expressible as
# posexplode, which is what the oracle (and any hot path) should use —
# the UDTF exists to prove the extension surface, schema contract and
# LATERAL plumbing, not to replace codegen'd explode.
# --------------------------------------------------------------------


def register_engine_udtfs(spark: SparkSession) -> list[str]:
    """Register the engine's Python UDTFs; returns the names.

    - ws_tokenize(text): yields (pos, token) per whitespace token,
      1-based positions, empty tokens skipped.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class WsTokenize:
        def eval(self, text: str):
            if text:
                pos = 0
                for tok in text.split(" "):
                    if tok:
                        pos += 1
                        yield (pos, tok)

    spark.udtf.register("ws_tokenize", WsTokenize)
    return ["ws_tokenize"]


_UDTF_QUERY_SQL = """
SELECT s.token,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(s.pos AS BIGINT)) AS BIGINT) AS pos_sum
FROM documents d, LATERAL ws_tokenize(d.text) s
GROUP BY s.token
ORDER BY n DESC, s.token
LIMIT 50
"""

_UDTF_ORACLE = """
WITH tk AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
pos AS (
  SELECT generate_subscripts(toks, 1) AS p, unnest(toks) AS token
  FROM tk
)
SELECT token,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(p AS BIGINT)) AS BIGINT) AS pos_sum
FROM pos
GROUP BY token
ORDER BY n DESC, token
LIMIT 50
"""


@register("udtf_tokenize_positions", oracle=_UDTF_ORACLE)
def udtf_tokenize_positions(spark: SparkSession, sf_dir: str):
    """Top tokens with positional mass computed through the Python
    UDTF surface (`FROM documents, LATERAL ws_tokenize(text)`) — the
    one-row-to-many-rows extension contract. The oracle recomputes
    the same expansion relationally (DuckDB unnest), so parity pins
    the UDTF's row-generation semantics exactly; integer aggregates
    keep it engine-exact. Production note: this tokenizer has a
    codegen twin (posexplode in text.py) — UDTFs are for generators
    Spark can't express, and batch per-partition Python cost is the
    price of that escape hatch."""
    register_engine_udtfs(spark)
    register_views(spark, sf_dir, only=("documents",))
    return spark.sql(_UDTF_QUERY_SQL)

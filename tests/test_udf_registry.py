"""Named SQL function surface: registration + semantics parity with
the operator library's inline expressions."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from workshop3_etl_spark.functions.udf_registry import register_engine_functions
from workshop3_etl_spark.sources.tables import load_table, register_views


def test_sql_functions_register_and_run(spark):
    names = register_engine_functions(spark)
    assert len(names) == 5
    register_views(spark, SF_SMOKE)
    row = spark.sql(
        """
        SELECT
          ws_token_count('a b  c') AS tc,
          ws_normalize('  Hello   World ') AS norm,
          ws_fingerprint('x') AS fp,
          ws_is_train('42', 42) AS flag
        """
    ).collect()[0]
    assert row["tc"] == 3
    assert row["norm"] == "hello world"
    assert len(row["fp"]) == 32
    assert row["flag"] in (0, 1)


def test_sql_functions_match_operator_library(spark):
    """User-facing named functions must agree with the operator
    library's inline expressions (one tokenizer, one fingerprint)."""
    register_engine_functions(spark)
    register_views(spark, SF_SMOKE)
    mismatch = spark.sql(
        """
        SELECT count(*) AS n FROM documents
        WHERE ws_token_count(text)
              != size(filter(split(text, ' '), x -> x != ''))
           OR ws_fingerprint(text)
              != md5(cast(trim(regexp_replace(lower(text), '\\\\s+', ' '))
                     as binary))
        """
    ).collect()[0]["n"]
    assert mismatch == 0


def test_pandas_udf_checksum_matches_stub(spark):
    """The Arrow-batched checksum function equals the mapInPandas
    decode stub's checksum on the same payloads."""
    register_engine_functions(spark)
    from workshop3_etl_spark.operators.multimodal import media_frame

    media = media_frame(spark, SF_SMOKE).limit(50)
    got = media.select(
        "media_id", F.expr("ws_media_checksum(payload)").alias("ck")
    ).collect()
    for r in got:
        raw = media.filter(F.col("media_id") == r["media_id"]).collect()[0]
        assert r["ck"] == sum(bytes(raw["payload"])) % 2_147_483_647

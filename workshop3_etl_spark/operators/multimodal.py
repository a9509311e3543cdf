"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The 100 TB-pipeline pattern for image/audio/video (BASELINE.json north
star): store media as opaque ``binary`` columns beside typed metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
Pandas functions over ``mapInPandas`` so the heavy Python work streams
through fixed-size batches instead of materializing partitions.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked STUB (deterministic fake header parse +
NotImplementedError for real decoding) — but everything Spark-side is
real and tested: the binary schema, the mapInPandas signature, batch
shapes, partition behavior, and the metadata aggregates.

Payloads are synthesized from documents.text bytes (the only blob
source in the testdata).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from workshop3_etl_spark.plans.registry import register
from workshop3_etl_spark.sources.tables import load_table


def media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (media_id, payload binary, media_type, n_bytes).

    Stand-in for ``spark.read.format('binaryFile')`` over an object
    store; the schema & downstream plumbing are the real thing.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/fake")
        .when(F.col("doc_id") % 3 == 1, "audio/fake")
        .otherwise("video/fake")
        .alias("media_type"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("header_byte", T.IntegerType()),
        T.StructField("checksum_mod", T.LongType()),
    ]
)


def decode_media_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decode kernel (mapInPandas contract).

    Parses a deterministic fake "header" (first byte + byte-sum mod
    2^31) per payload. A real deployment replaces the body with
    PIL/ffmpeg decoding — same signature, same batch shape.
    """
    for pdf in batches:
        out = pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"],
                "header_byte": [
                    int(p[0]) if len(p) else -1 for p in pdf["payload"]
                ],
                "checksum_mod": [
                    int(sum(p) % 2_147_483_647) for p in pdf["payload"]
                ],
            }
        )
        yield out


def decode_media_real(*_args, **_kwargs):  # pragma: no cover
    """Real media decoding — requires codec libs absent from this
    environment."""
    raise NotImplementedError(
        "image/audio decode requires PIL/ffmpeg; wire your codec into "
        "decode_media_stub's mapInPandas body"
    )


_MM_ORACLE = """
SELECT
  CASE WHEN doc_id % 3 = 0 THEN 'image/fake'
       WHEN doc_id % 3 = 1 THEN 'audio/fake'
       ELSE 'video/fake' END AS media_type,
  CAST(COUNT(*) AS BIGINT) AS n_media,
  CAST(SUM(CAST(strlen(text) AS BIGINT)) AS BIGINT) AS total_bytes,
  CAST(MAX(strlen(text)) AS BIGINT) AS max_bytes
FROM documents
GROUP BY 1
ORDER BY media_type
"""


@register("multimodal_payload_stats", oracle=_MM_ORACLE)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level stats over the binary payload column (pure JVM —
    proves the binary schema flows through scan/agg untouched)."""
    media = media_frame(spark, sf_dir)
    return (
        media.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.max("n_bytes").cast("long").alias("max_bytes"),
        )
        .orderBy("media_type")
    )


@register("multimodal_decode_features", oracle=None)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode (stub kernel) via mapInPandas, then a
    JVM-side aggregate over the extracted features. Rows-only check:
    the Python kernel isn't SQL, but tests/test_multimodal.py pins the
    checksum semantics.
    """
    media = media_frame(spark, sf_dir)
    decoded = media.mapInPandas(decode_media_stub, schema=_DECODE_SCHEMA)
    return (
        decoded.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.min("header_byte").alias("min_header_byte"),
            F.max("header_byte").alias("max_header_byte"),
            F.sum("checksum_mod").cast("long").alias("sum_checksum_mod"),
        )
        .orderBy("media_type")
    )

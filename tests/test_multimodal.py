"""Multimodal plumbing tests: binary schema, mapInPandas batch
contract, and the stubbed decode kernel's pinned semantics."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from workshop3_etl_spark.operators.multimodal import (
    decode_media_real,
    media_frame,
    multimodal_decode_features,
)


def test_binary_schema(spark):
    media = media_frame(spark, SF_SMOKE)
    kinds = dict(media.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["n_bytes"] == "bigint"
    assert media.count() == 500


def test_decode_stub_checksum_pinned(spark):
    """The fake header parse is deterministic: checksum == byte-sum
    mod 2^31 recomputed driver-side for a sample."""
    media = media_frame(spark, SF_SMOKE).limit(20).collect()
    from workshop3_etl_spark.operators.multimodal import decode_media_stub
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "media_id": [r["media_id"] for r in media],
            "media_type": [r["media_type"] for r in media],
            "n_bytes": [r["n_bytes"] for r in media],
            "payload": [bytes(r["payload"]) for r in media],
        }
    )
    out = next(decode_media_stub(iter([pdf])))
    for i, r in enumerate(media):
        assert out["checksum_mod"][i] == sum(bytes(r["payload"])) % 2_147_483_647
        assert out["header_byte"][i] == bytes(r["payload"])[0]


def test_decode_features_runs_distributed(spark):
    out = multimodal_decode_features(spark, SF_SMOKE).collect()
    assert sum(r["n_media"] for r in out) == 500
    assert {r["media_type"] for r in out} == {
        "image/fake", "audio/fake", "video/fake"
    }


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_media_real()

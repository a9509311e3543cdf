"""Semantic checks for the PII-scrub corpus stage (oracle parity is
covered by test_oracle_parity's auto-parametrization)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from workshop3_etl_spark.operators.corpus import corpus_pii_scrub_stats


def test_pii_scrub_finds_and_removes_everything(spark):
    row = corpus_pii_scrub_stats(spark, SF_SMOKE).collect()[0]
    # non-vacuous: the deterministic injection guarantees every PII
    # class appears (doc_id % 5 / % 7 / % 11 all hit in any corpus
    # with >= 11 docs)
    assert row["n_emails"] > 0
    assert row["n_phones"] > 0
    assert row["n_ips"] > 0
    assert row["n_docs_with_pii"] > 0
    assert row["n_docs_with_pii"] <= row["n_docs"]
    # the audit: scrubbing leaves NO residual match of any pattern
    assert row["residual_pii"] == 0


def test_pii_scrub_redacts_adversarial_strings(spark):
    """Hand-built adversarial payloads through the same scrub
    expressions: adjacent PII, PII at string edges, mixed types in
    one doc."""
    from workshop3_etl_spark.operators.corpus import _scrub_expr

    payloads = [
        "a@b.co c@d.io",                       # adjacent emails
        "555-123-4567",                         # bare phone, whole string
        "ip 1.2.3.4 then 255.255.255.255 end",  # two IPs
        "x user.name+tag@sub.domain.org y 555-000-1111 z 10.0.0.1",
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "text string")
    clean = df.select(_scrub_expr("text").alias("clean"))
    got = [r["clean"] for r in clean.collect()]
    assert got == [
        "<EMAIL> <EMAIL>",
        "<PHONE>",
        "ip <IP> then <IP> end",
        "x <EMAIL> y <PHONE> z <IP>",
    ]


def test_crossdoc_ngram_fraction_detects_planted_duplicates(spark):
    """Plant a shared span across documents and assert the operator
    sees exactly it: two docs sharing one 8-token span, one unique
    doc — fractions are computable by hand."""
    from pyspark.sql import functions as F

    from workshop3_etl_spark.operators.dedup import (
        dedup_crossdoc_ngram_fraction,
    )
    from workshop3_etl_spark.sources import tables

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"{span} unique1 unique2", "en"),
        (2, f"prefix1 prefix2 {span}", "en"),
        (3, "lone1 lone2 lone3 lone4 lone5 lone6 lone7 lone8", "fr"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        got = {
            r["lang"]: (
                r["dup_shingles"],
                r["total_shingles"],
                r["n_docs_flagged"],
            )
            for r in dedup_crossdoc_ngram_fraction(spark, d).collect()
        }
    # doc1: 3 shingles (10 tokens), doc2: 3 shingles; exactly the
    # planted span's shingle is shared -> 1 dup shingle in each.
    # 1/3 > 30% -> both flagged. doc3: 1 shingle, unique, unflagged.
    assert got["en"] == (2, 6, 2)
    assert got["fr"] == (0, 1, 0)


def test_resample_temperature_acceptance_matches_python(spark):
    """Acceptance must equal a pure-Python recompute of the same
    thresholds+hashes; the max-oversample language keeps everything;
    achieved composition tracks the alpha=0.5 target."""
    import hashlib
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    from tests.conftest import SF_SMOKE
    from workshop3_etl_spark.operators.corpus import (
        _RESAMPLE_SALT,
        corpus_resample_temperature,
    )
    from workshop3_etl_spark.sources.tables import load_table

    rows = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "lang")
        .collect()
    )
    n = Counter(r["lang"] for r in rows)
    import decimal

    denom = sum(
        float(
            decimal.Decimal(repr(math.sqrt(c))).quantize(
                decimal.Decimal("0.000001"),
                rounding=decimal.ROUND_HALF_UP,
            )
        )
        for c in n.values()
    )
    total = sum(n.values())
    ovf = {
        lg: (math.sqrt(c) / denom) / (c / total) for lg, c in n.items()
    }
    mxv = max(ovf.values())
    t60 = {lg: math.floor(v / mxv * float(1 << 60)) for lg, v in ovf.items()}
    acc = Counter()
    for r in rows:
        u = int(
            hashlib.md5(
                f"{r['doc_id']}:{_RESAMPLE_SALT}".encode()
            ).hexdigest()[:15],
            16,
        )
        if u < t60[r["lang"]]:
            acc[r["lang"]] += 1
    got = {
        r["lang"]: r for r in corpus_resample_temperature(
            spark, SF_SMOKE
        ).collect()
    }
    assert {lg: g["n_accepted"] for lg, g in got.items()} == dict(acc)
    # the max-oversample language is kept whole
    keep_all = max(ovf, key=lambda lg: ovf[lg])
    assert got[keep_all]["n_accepted"] == n[keep_all]
    # achieved composition tracks the target within sampling noise
    ta = sum(acc.values())
    for lg, g in got.items():
        sigma = math.sqrt(max(g["target_share"] * (1 - g["target_share"])
                              / ta, 1e-12))
        assert abs(g["achieved_share"] - g["target_share"]) < 6 * sigma + 0.02


def test_token_budget_apportionment_is_exact_hamilton(spark):
    """Brute-force Hamilton recompute from raw documents: quotas,
    remainders, seat assignment — and the defining invariant that
    allocations sum to the budget EXACTLY."""
    from workshop3_etl_spark.operators.corpus import (
        _BUDGET_TOKENS,
        corpus_token_budget_apportion,
    )
    from workshop3_etl_spark.sources.tables import load_table

    got = corpus_token_budget_apportion(spark, SF_SMOKE).collect()
    assert sum(r["alloc_tokens"] for r in got) == _BUDGET_TOKENS

    rows = load_table(spark, SF_SMOKE, "documents").select(
        "source", "text"
    ).collect()
    mass: dict = {}
    for r in rows:
        nd, nt = mass.get(r["source"], (0, 0))
        mass[r["source"]] = (
            nd + 1,
            nt + len([w for w in r["text"].split(" ") if w]),
        )
    tt = sum(nt for _, nt in mass.values())
    quotas = {
        src: (
            _BUDGET_TOKENS * nt // tt,
            _BUDGET_TOKENS * nt % tt,
        )
        for src, (_, nt) in mass.items()
    }
    n_extra = _BUDGET_TOKENS - sum(f for f, _ in quotas.values())
    order = sorted(quotas, key=lambda s: (-quotas[s][1], s))
    extras = set(order[:n_extra])
    for r in got:
        src = r["source"]
        nd, nt = mass[src]
        f, rem = quotas[src]
        assert (r["n_docs"], r["n_tokens"]) == (nd, nt)
        assert r["floor_alloc"] == f
        assert r["remainder_num"] == rem
        assert r["extra"] == int(src in extras)
        assert r["alloc_tokens"] == f + int(src in extras)

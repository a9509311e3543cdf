"""Semantic checks for the CDC changelog-apply snapshot: tombstone
handling must follow latest-wins MERGE semantics (a delete newer than
every upsert removes the key; an older delete is superseded).

Formulated independently of the registry oracle (set logic via DuckDB,
not a window): a user is in the snapshot iff their LATEST change is
not a tombstone.
"""

from __future__ import annotations

from tests.conftest import SF_CORRECT
from workshop3_etl_spark.plans import registry


def test_cdc_snapshot_tombstone_semantics(spark, duck):
    snap = registry.get("cdc_apply_latest_snapshot").fn(spark, SF_CORRECT)
    got_users = {r["user_id"] for r in snap.select("user_id").collect()}

    rows = duck.execute(
        """
        SELECT user_id,
               arg_max(event_type,
                       CAST(epoch_us(ts) AS HUGEINT) * 10000000
                       + event_id) AS last_type
        FROM events GROUP BY user_id
        """
    ).fetchall()
    want_users = {u for u, t in rows if t != "error"}
    deleted = {u for u, t in rows if t == "error"}

    assert got_users == want_users
    assert got_users.isdisjoint(deleted)
    # the dataset genuinely exercises both branches
    assert deleted, "fixture has no tombstone-last user; test is vacuous"
    assert want_users, "fixture has no surviving user; test is vacuous"


def test_cdc_snapshot_one_row_per_key(spark):
    snap = registry.get("cdc_apply_latest_snapshot").fn(spark, SF_CORRECT)
    total = snap.count()
    distinct = snap.select("user_id").distinct().count()
    assert total == distinct

"""Storage-discipline guards for the iterative-operator checkpoint
protocol (functions/cache.py).

The round-5 finding these tests pin: ``DataFrame.unpersist()`` does
NOT free localCheckpoint blocks — they live in ``sc.persistentRdds``
until the async ContextCleaner collects them, so an iterative query
that checkpoints per round leaks storage for the whole session unless
it releases the superseded rounds deterministically. Before the fix a
single BFS run left +13 persisted RDDs; a full registry sweep at
sf0.1 OOM'd the driver.

Contract under test: every iterative registry query leaves behind at
most its own (small, reference-counted) result checkpoint.

Assertions compare persisted-RDD *id sets*, not raw counts, so the
async ContextCleaner collecting unrelated garbage mid-test can't make
them flaky.
"""

from pyspark.sql import functions as F

from workshop3_etl_spark.functions.cache import (
    release_checkpoint,
    tracked_local_checkpoint,
)

SF = "/root/testdata/sf0.001"

# The result of materialize_and_release is itself one localCheckpoint
# (freed by the ContextCleaner when the caller drops the frame); a
# checkpoint can register a couple of internal RDD ids.
_RESULT_CKPT_ALLOWANCE = 3


def _persistent_ids(spark) -> set[int]:
    jsc = spark.sparkContext._jsc
    return {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}


def test_tracked_checkpoint_release_roundtrip(spark):
    df = tracked_local_checkpoint(spark.range(100).withColumn("v", F.col("id") * 2))
    tracked = set(df._ckpt_rdd_ids)
    assert tracked, "checkpoint registered no persistent RDDs"
    assert tracked <= _persistent_ids(spark)
    assert df.count() == 100  # usable while tracked
    release_checkpoint(df)
    assert not (tracked & _persistent_ids(spark)), "release left blocks behind"
    release_checkpoint(df)  # idempotent


def test_release_checkpoint_tolerates_untracked_frames(spark):
    plain = spark.range(10)
    release_checkpoint(plain)  # no _ckpt_rdd_ids: no-op
    release_checkpoint(None)


def test_supersede_frees_old_round(spark):
    from workshop3_etl_spark.functions.cache import supersede

    seen: set[int] = set()
    cur = tracked_local_checkpoint(spark.range(50).selectExpr("id as v"))
    seen |= cur._ckpt_rdd_ids
    for _ in range(4):
        cur = supersede(cur.selectExpr("v + 1 as v"), cur)
        seen |= cur._ckpt_rdd_ids
    # only the latest round's blocks remain out of everything created
    live = seen & _persistent_ids(spark)
    assert live == set(cur._ckpt_rdd_ids)
    assert cur.agg(F.sum("v")).collect()[0][0] == sum(range(50)) + 4 * 50
    release_checkpoint(cur)
    assert not (seen & _persistent_ids(spark))


def _assert_query_leaves_only_result_ckpt(spark, fn):
    before = _persistent_ids(spark)
    out = fn(spark, SF)
    out.collect()
    # new ids still persisted after the query returned its result
    leaked = _persistent_ids(spark) - before
    assert len(leaked) <= _RESULT_CKPT_ALLOWANCE, (
        f"{fn.__name__} left {len(leaked)} persisted RDDs behind "
        f"(allowance {_RESULT_CKPT_ALLOWANCE} for the result checkpoint)"
    )


def test_bfs_does_not_leak_round_checkpoints(spark):
    from workshop3_etl_spark.operators.assoc import graph_bfs_hops_copurchase

    _assert_query_leaves_only_result_ckpt(spark, graph_bfs_hops_copurchase)


def test_kcore_does_not_leak_round_checkpoints(spark):
    from workshop3_etl_spark.operators.assoc import graph_kcore_copurchase

    _assert_query_leaves_only_result_ckpt(spark, graph_kcore_copurchase)


def test_connected_components_do_not_leak_round_checkpoints(spark):
    from workshop3_etl_spark.operators.dedup import dedup_connected_components

    _assert_query_leaves_only_result_ckpt(spark, dedup_connected_components)


def test_cluster_keepers_do_not_leak_round_checkpoints(spark):
    from workshop3_etl_spark.operators.dedup import dedup_cluster_keepers

    _assert_query_leaves_only_result_ckpt(spark, dedup_cluster_keepers)


def test_pagerank_does_not_leak_round_checkpoints(spark):
    from workshop3_etl_spark.operators.assoc import (
        graph_pagerank_copurchase,
    )

    _assert_query_leaves_only_result_ckpt(spark, graph_pagerank_copurchase)


def test_label_propagation_does_not_leak_round_checkpoints(spark):
    from workshop3_etl_spark.operators.assoc import (
        graph_label_propagation_copurchase,
    )

    _assert_query_leaves_only_result_ckpt(
        spark, graph_label_propagation_copurchase
    )


def test_range_partition_plan_does_not_leak_checkpoints(spark):
    from workshop3_etl_spark.plans import registry

    _assert_query_leaves_only_result_ckpt(
        spark, registry.get("layout_range_partition_plan").fn
    )


def test_bloom_index_stats_does_not_leak_checkpoints(spark):
    from workshop3_etl_spark.plans import registry

    _assert_query_leaves_only_result_ckpt(
        spark, registry.get("layout_bloom_prune_stats").fn
    )

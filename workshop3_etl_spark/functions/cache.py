"""Storage discipline for index-building operators.

MinHash/SimHash/LSH/IVF queries persist a signature ("index") frame
because their band-union + self-join plans reference it many times —
without the materialization boundary Spark recomputes the whole
upstream pipeline per branch. But a registry query that persists and
never unpersists leaks executor storage memory across repeated
invocations in one session.

``materialize_and_release`` is the contract: eagerly localCheckpoint
the (small) result so it no longer depends on the index frames, then
unpersist them.

localCheckpoint subtlety (round-5 finding): ``DataFrame.unpersist()``
does NOT free localCheckpoint blocks — they belong to an internal RDD
registered in ``sc.persistentRdds`` that only the async
ContextCleaner unpersists, after BOTH the Python reference and the
py4j-held JVM reference are garbage collected. In a long multi-query
session that lag accumulates (measured: +13 persisted RDDs after one
BFS run; a full registry sweep at sf0.1 OOM'd a default-heap driver).
``tracked_local_checkpoint`` therefore records the RDD ids each
checkpoint creates, and ``release_checkpoint`` unpersists them
directly and deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _persistent_ids(df: DataFrame) -> set[int]:
    jsc = df.sparkSession.sparkContext._jsc
    # py4j auto-converts boxed Integers to Python ints
    return {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}


def tracked_local_checkpoint(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint that records the persisted-RDD ids it
    creates (on the returned frame, as ``_ckpt_rdd_ids``) so
    ``release_checkpoint`` can free the blocks deterministically.
    Driver-side loop code is single-threaded, so the before/after id
    diff is exactly this checkpoint's RDDs."""
    before = _persistent_ids(df)
    out = df.localCheckpoint(eager=True)
    out._ckpt_rdd_ids = _persistent_ids(out) - before
    return out


def release_checkpoint(df: DataFrame | None) -> None:
    """Free a tracked checkpoint's blocks NOW (not at GC time). Safe
    only once nothing will read the frame again — a released
    localCheckpoint cannot be recomputed (lineage was truncated), so
    accidental reuse fails loudly rather than silently rescanning."""
    if df is None:
        return
    ids = getattr(df, "_ckpt_rdd_ids", None)
    if not ids:
        return
    jsc = df.sparkSession.sparkContext._jsc
    m = jsc.getPersistentRDDs()
    for rid in ids:
        r = m.get(rid)
        if r is not None:
            r.unpersist()
    df._ckpt_rdd_ids = set()


def materialize_and_release(result: DataFrame, *index_frames: DataFrame) -> DataFrame:
    """Materialize ``result`` (cutting its lineage), then release the
    index frames it was built from — both persist()-ed frames
    (unpersist) and tracked checkpoints (release_checkpoint). The
    result must be small (an aggregate / top-k / candidate summary) —
    localCheckpoint stores it on executors; its own blocks are freed
    by the ContextCleaner when the returned frame is GC'd."""
    out = result.localCheckpoint(eager=True)
    for f in index_frames:
        f.unpersist()
        release_checkpoint(f)
    return out


def supersede(new_df: DataFrame, old_df: DataFrame | None) -> DataFrame:
    """Iterative-loop storage discipline: eagerly checkpoint the new
    round's frame (tracked), then free the round it supersedes. The
    new frame is materialized BEFORE the old one is dropped, so
    nothing ever recomputes through a released checkpoint."""
    out = tracked_local_checkpoint(new_df)
    if old_df is not None:
        old_df.unpersist()
        release_checkpoint(old_df)
    return out

"""Storage discipline for index-building operators.

MinHash/SimHash/LSH/IVF queries persist a signature ("index") frame
because their band-union + self-join plans reference it many times —
without the materialization boundary Spark recomputes the whole
upstream pipeline per branch. But a registry query that persists and
never unpersists leaks executor storage memory across repeated
invocations in one session.

``materialize_and_release`` is the contract: eagerly localCheckpoint
the (small) result so it no longer depends on the index frames, then
unpersist them. The checkpointed blocks are reference-counted by
Spark's ContextCleaner and freed when the returned DataFrame is
garbage collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_and_release(result: DataFrame, *index_frames: DataFrame) -> DataFrame:
    """Materialize ``result`` (cutting its lineage), then unpersist the
    index frames it was built from. The result must be small (an
    aggregate / top-k / candidate summary) — localCheckpoint stores it
    on executors."""
    out = result.localCheckpoint(eager=True)
    for f in index_frames:
        f.unpersist()
    return out

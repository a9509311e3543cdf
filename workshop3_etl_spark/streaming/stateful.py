"""Custom stateful streaming operator: per-key online regression
metrics (the reference's CountryStats Welford accumulator,
`kafka/consumer.py:123-151,249-255`, as a first-class Spark operator).

Where streaming/batch_equivalent.py shows that plain aggregates cover
A12's *results*, this module reproduces its *mechanism* — explicit
per-key mutable state updated per micro-batch — with
``applyInPandasWithState``:

- state is (n, mean, m2, sum_abs_err): Welford's online variance plus
  the MAE numerator, exactly the reference's dict fields;
- unlike the reference's process-local dict (unbounded, lost on
  crash), state here is sharded by key across executors, checkpointed,
  and bounded by a GroupStateTimeout TTL — the SURVEY §2.9
  scale-hardening fix.

Emitted per key per batch: running n / mean / variance / mae — the
incremental KPI feed the consumer prints every 200 messages.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),
        T.StructField("sum_abs_err", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("mean_value", T.DoubleType()),
        T.StructField("var_pop", T.DoubleType()),
        T.StructField("running_mae", T.DoubleType()),
    ]
)


def _welford_update(
    key: Any,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Welford merge of each micro-batch into per-key state
    (numerically the same recurrence as `kafka/consumer.py:131-140`)."""
    if state.exists:
        n, mean, m2, sae = state.get
    else:
        n, mean, m2, sae = 0, 0.0, 0.0, 0.0
    for pdf in pdfs:
        for v, err in zip(pdf["value"], pdf["abs_err"]):
            n += 1
            delta = float(v) - mean
            mean += delta / n
            m2 += delta * (float(v) - mean)
            sae += float(err)
    state.update((n, mean, m2, sae))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "n": [n],
            "mean_value": [mean],
            "var_pop": [m2 / n if n else 0.0],
            "running_mae": [sae / n if n else 0.0],
        }
    )


def per_key_online_metrics(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Attach the stateful operator to a stream.

    ``events`` must carry (key_col, value, abs_err). Output mode
    "update": one row per touched key per micro-batch — the same
    cadence as the reference's periodic per-country report
    (`kafka/consumer.py:153-160`).
    """
    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            _welford_update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            # NoTimeout here: with availableNow a processing-time
            # timeout re-arms after every batch and the query never
            # drains. A 24/7 deployment flips this to
            # ProcessingTimeTimeout + state.setTimeoutDuration(ttl_ms)
            # (+ state.hasTimedOut -> state.remove()) to bound state.
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

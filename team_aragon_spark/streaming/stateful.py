"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in streaming aggregates (windowed agg, session_window — see
events_stream.py) cover the reference-shaped workloads; this module is
the escape hatch for semantics they can't express: arbitrary per-key
state evolved batch-by-batch with user code (Arrow-batched pandas, not
per-row Python).

``running_user_totals_stream`` keeps, per user, a lifetime running
(count, sum, max) over event values and re-emits the updated totals
whenever the user appears in a micro-batch — the classic "customer
lifetime metrics" operator.  Unlike a windowed agg the state never
closes; unlike the batch groupBy it emits incrementally.

Scale posture: state is one small struct per user key, hash-partitioned
across executors by the groupBy, persisted in the checkpointed state
store (RocksDB-backed on a real cluster) — memory is O(active users /
executor), independent of stream length.  Arrow moves each key group
into pandas in one batch; no row-at-a-time Python.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


def _update_user_totals(
    key: Tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in batches:
        vals = pdf["value"].dropna()
        n += len(pdf)
        total += float(vals.sum())
        if len(vals):
            mx = max(mx, float(vals.max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "max_value": [None if mx == float("-inf") else mx],
        }
    )


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user lifetime (count, sum, max) of ``value``, emitted on
    every micro-batch the user appears in; state persists across
    batches in the checkpointed store."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

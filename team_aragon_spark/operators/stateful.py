"""Non-associative per-key scans via Arrow-batched mapInPandas.

Some per-key recurrences cannot be expressed with window frames
because the per-step transform is not associative — the canonical
example is a running balance CLAMPED to a range after every step
(prefix sums overshoot the clamp).  Spark's escape hatch is the
Pandas-UDF family; the SHAPE matters enormously:

- ``applyInPandas`` (grouped map) constructs one pandas DataFrame per
  KEY — at 150k users that is 150k DataFrame constructions per
  epoch, and the per-group overhead (~1 ms) dwarfs the actual scan
  (measured 7.8 s at sf0.1 / 36 s at 100x for q197's first cut).
- ``mapInPandas`` over data repartitioned by the key and sorted
  (key, ts, id) WITHIN each partition sees whole Arrow batches and
  walks all keys of a partition in ONE Python pass, carrying the
  open key's state across batch boundaries (batches can split a key;
  partitions cannot).  Same semantics, no per-key object churn.

Design rules (the repo's Python-boundary conventions, cf.
operators/multimodal.py):
- one shuffle on the key, state O(1) per key;
- emit aggregated per-key rows, never per-event rows;
- the arithmetic inside is a plain sequential float recurrence — the
  same add/compare sequence any other engine would run in event
  order, which is what lets a declarative RECURSIVE CTE oracle match
  bit-for-bit (q197).

Reference parity: the reference has no stateful scan (SURVEY.md §2
notes absence); this is a north-star extension operator.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "user_id long, n_events long, final_balance double, "
    "n_clamped_top long, n_clamped_bottom long"
)


def capped_running_balance(
    events: DataFrame,
    cap: float,
    floor: float,
    add_type: str = "purchase",
    sub_type: str = "error",
) -> DataFrame:
    """Per-user running balance of +value on ``add_type`` / -value on
    ``sub_type`` events (others contribute 0), clamped into
    ``[floor, cap]`` after EVERY step, in (ts, event_id) order.

    Returns one row per user: event count, final balance (rounded to
    2 JVM-side — Spark and DuckDB both round half-away-from-zero,
    Python's round() is banker's; the raw double crosses the Arrow
    boundary unrounded), and how many steps hit each clamp boundary
    (strict overshoot: a step that lands exactly ON the boundary is
    not clamped).
    """

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One sequential pass over a (user-sorted) partition.  State
        # for the OPEN user carries across Arrow batches; a user never
        # spans partitions (hash repartition on user_id).
        uid = None
        bal, top, bot, cnt = 0.0, 0, 0, 0
        out_u, out_n, out_b, out_t, out_o = [], [], [], [], []

        def close():
            out_u.append(uid)
            out_n.append(cnt)
            out_b.append(bal)
            out_t.append(top)
            out_o.append(bot)

        for pdf in batches:
            # .tolist(): C doubles -> Python floats once; iterating
            # numpy scalars boxes np.float64 per step (~3x slower)
            users = pdf["user_id"].to_numpy().tolist()
            deltas = pdf["delta"].to_numpy().tolist()
            for u, d in zip(users, deltas):
                if u != uid:
                    if uid is not None:
                        close()
                    uid, bal, top, bot, cnt = u, 0.0, 0, 0, 0
                cnt += 1
                bal += d
                if bal > cap:
                    bal, top = cap, top + 1
                elif bal < floor:
                    bal, bot = floor, bot + 1
        if uid is not None:
            close()
        yield pd.DataFrame(
            {
                "user_id": pd.Series(out_u, dtype="int64"),
                "n_events": pd.Series(out_n, dtype="int64"),
                "final_balance": pd.Series(out_b, dtype="float64"),
                "n_clamped_top": pd.Series(out_t, dtype="int64"),
                "n_clamped_bottom": pd.Series(out_o, dtype="int64"),
            }
        )

    delta = (
        F.when(F.col("event_type") == add_type, F.col("value"))
        .when(F.col("event_type") == sub_type, -F.col("value"))
        .otherwise(F.lit(0.0))
    )
    slim = (
        events.select("user_id", "ts", "event_id", delta.alias("delta"))
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
    )
    out = slim.mapInPandas(scan, _OUT_SCHEMA)
    return out.withColumn("final_balance", F.round("final_balance", 2))

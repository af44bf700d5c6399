"""Window-function operators (extension — absent from the reference,
SURVEY.md §2.H, but required by any real analytics surface).

All are single-shuffle plans: one hash partition on the group key,
ordered within partitions.  Skewed group keys are handled by AQE; for
pathological single-key skew, pre-aggregate or salt upstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame, group_cols: Sequence[str], order_col: str, k: int, descending: bool = True, tiebreak: str | None = None
) -> DataFrame:
    """Top-k rows per group via row_number (TakeOrdered per partition).

    Deterministic when ``tiebreak`` totally orders ties.
    """
    order = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    id_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign session ids: a new session starts after a > gap silence.

    Classic lag + cumulative-sum sessionization (batch analogue of
    ``session_window``): one shuffle on the user key, two window passes
    over the same partitioning (Spark reuses the exchange).
    """
    order = [F.col(ts_col).asc(), F.col(id_tiebreak).asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_ms = gap_minutes * 60 * 1000
    prev = F.lag(F.col(ts_col)).over(w)
    # unix_millis rejects TIMESTAMP_NTZ; the session tz is pinned UTC
    # (session.py), so the NTZ->LTZ cast is value-preserving and works
    # for either timestamp flavor the source surfaces.
    ms = lambda c: F.unix_millis(c.cast("timestamp"))  # noqa: E731
    is_new = F.when(
        prev.isNull() | ((ms(F.col(ts_col)) - ms(prev)) > gap_ms), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("__new", is_new).withColumn("session_id", F.sum("__new").over(running)).drop("__new")


def session_stats(df: DataFrame, user_col: str = "user_id", **kwargs) -> DataFrame:
    """Per-user session summary: number of sessions and events."""
    s = sessionize(df, user_col=user_col, **kwargs)
    return s.groupBy(user_col).agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )

"""As-of (temporal) join — an operator Spark lacks natively.

The reference has no as-of join (SURVEY.md §2.C: inner equi-joins
only); this is a north-star extension for time-series enrichment
("for each left row, the most recent right row at or before its
timestamp, per key").

Design — union-merge, not probe: tag both sides, union them, shuffle
ONCE on the join key, sort within partitions by (ts, side), and carry
right-side values forward with ``last(ignorenulls)`` over an
unbounded-preceding window.  This is the distributed analogue of the
classic merge as-of:

- one Exchange total (hashpartitioning on the key) — same cost as a
  sort-merge join, with no range-condition nested loop;
- state per partition is a single running value per carried column —
  no interval explosion, no skew amplification beyond the key's own
  skew (salt the key upstream if one entity dominates);
- scales linearly in rows: at 100 TB both sides stream through the
  sorted partition exactly once.

Semantics match DuckDB/`pandas.merge_asof`: ``direction='backward'``
takes the latest right row with ``right_ts <= left_ts``; ``'forward'``
the earliest with ``right_ts >= left_ts`` (the same single-pass carry
over the reversed sort order); ``'nearest'`` whichever of the two is
closer (both carries over one Exchange, ties prefer backward);
``tolerance`` bounds the staleness and NULLs the carried values
beyond it.  Ties on (key, ts) between sides
resolve right-before-left so an exactly-simultaneous right row IS
visible to the left row in both directions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"  # 0 = right (values), 1 = left (probes)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: every ``left`` row, enriched with ``value_cols``
    from the matching ``right`` row on the same ``on`` key (NULL if
    none) — ``direction='backward'``: latest row with
    ``right_ts <= left_ts``; ``'forward'``: earliest row with
    ``right_ts >= left_ts``.

    ``tolerance`` is a SQL expression string bounding the time gap
    (e.g. ``"INTERVAL '1' HOUR"`` for timestamps, ``"10"`` for numeric
    ts): matches farther away than that yield NULLs, mirroring
    ``pandas.merge_asof(tolerance=...)``.

    ``tiebreak`` orders right rows sharing (key, ts) deterministically
    (last in tiebreak order wins), since Spark has no row order.

    All ``value_cols`` (plus the matched right timestamp) travel as
    ONE struct with a single ``last(ignorenulls)`` — so the output
    always reflects exactly the matched right ROW: a NULL value in
    that row stays NULL (it is not papered over by an older non-null),
    and multiple value columns can never mix values from different
    right rows.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    from pyspark.sql import types as T

    payload_t = T.StructType(
        [right.schema[c] for c in value_cols] + [T.StructField("__rts", right.schema[right_ts].dataType)]
    )
    payload = "__asof_payload"

    l_tag = (
        left.withColumn(_SIDE, F.lit(1))
        .withColumn("__asof_ts", F.col(left_ts))
        .withColumn(payload, F.lit(None).cast(payload_t))
    )

    r_tag = right.select(
        *on,
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(_SIDE),
        F.struct(
            *[F.col(c).alias(c) for c in value_cols],
            F.col(right_ts).alias("__rts"),
        ).alias(payload),
        *([F.col(tiebreak).alias("__asof_tb")] if tiebreak else []),
    )
    l_cols = left.columns
    l_tag = l_tag.select(
        *on,
        "__asof_ts",
        _SIDE,
        payload,
        *([F.lit(None).cast(right.schema[tiebreak].dataType).alias("__asof_tb")] if tiebreak else []),
        *[F.col(c) for c in l_cols if c not in on],
    )
    r_full = r_tag
    for c in l_cols:
        if c not in on:
            r_full = r_full.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    # backward scans time ascending (carry = latest earlier right row);
    # forward scans time DESCENDING, so the same carry yields the
    # earliest later right row.  Side asc in both: an equal-ts right
    # row is scanned before the left row and is therefore visible.
    # 'nearest' computes BOTH carries over the same union — the two
    # windows share the hash partitioning, so it still costs one
    # Exchange (plus a second in-partition sort) — and keeps the
    # closer side per row.
    tb = [F.col("__asof_tb").asc_nulls_first()] if tiebreak else []
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("__asof_ts").asc(), F.col(_SIDE).asc(), *tb)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("__asof_ts").desc(), F.col(_SIDE).asc(), *tb)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = l_tag.unionByName(r_full.select(*l_tag.columns))
    if direction == "backward":
        unioned = unioned.withColumn(payload, F.last(payload, ignorenulls=True).over(w_back))
    elif direction == "forward":
        unioned = unioned.withColumn(payload, F.last(payload, ignorenulls=True).over(w_fwd))
    else:
        unioned = unioned.withColumn("__pb", F.last(payload, ignorenulls=True).over(w_back))
        unioned = unioned.withColumn("__pf", F.last(payload, ignorenulls=True).over(w_fwd))

    out = unioned.filter(F.col(_SIDE) == 1)

    def _within(p: str, gap: str) -> str:
        return f"({p}.__rts IS NOT NULL AND ({gap}) <= ({tolerance}))"

    if direction == "nearest":
        gb, gf = "__asof_ts - __pb.__rts", "__pf.__rts - __asof_ts"
        if tolerance is not None:
            out = out.withColumn(
                "__pb", F.when(F.expr(_within("__pb", gb)), F.col("__pb")).otherwise(F.lit(None).cast(payload_t))
            ).withColumn(
                "__pf", F.when(F.expr(_within("__pf", gf)), F.col("__pf")).otherwise(F.lit(None).cast(payload_t))
            )
        # closer side wins; exact-distance ties prefer backward
        # (pandas.merge_asof 'nearest' keeps the earlier row on ties).
        pick = (
            "CASE WHEN __pb.__rts IS NULL THEN __pf "
            "WHEN __pf.__rts IS NULL THEN __pb "
            f"WHEN ({gb}) <= ({gf}) THEN __pb ELSE __pf END"
        )
        out = out.withColumn(payload, F.expr(pick)).drop("__pb", "__pf")
    elif tolerance is not None:
        gap = (
            f"__asof_ts - {payload}.__rts"
            if direction == "backward"
            else f"{payload}.__rts - __asof_ts"
        )
        out = out.withColumn(
            payload,
            F.when(F.expr(f"({gap}) <= ({tolerance})"), F.col(payload)).otherwise(
                F.lit(None).cast(payload_t)
            ),
        )
    return out.select(
        *on,
        *[F.col(c) for c in l_cols if c not in on],
        *[F.col(f"{payload}.{c}").alias(c) for c in value_cols],
    )

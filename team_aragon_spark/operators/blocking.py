"""Sorted-neighborhood blocking — the sliding-window complement to
key-equality blocking for entity resolution.

Key-equality blocking (q248's (nation, mktsegment) blocks) misses any
match whose blocking key disagrees — the classic failure mode the
merge/purge sorted-neighborhood method (Hernández & Stolfo, SIGMOD
1995) exists to cover: sort the corpus by a fuzzy-similarity-ordered
key and compare each record only against its w-1 successors in the
sorted order.  |candidates| = n * (w-1), linear in the corpus, no
block-size quadratic term at all.

The distributed obstacle is the GLOBAL ROW NUMBER: a bare
``row_number() OVER (ORDER BY ...)`` collapses the corpus into ONE
window partition — the single-partition WindowExec cliff.  The
scale-safe shape implemented here:

1. bucketize the sort key with a MONOTONE bounded-cardinality bucket
   expression (aligned with the order prefix, so (bucket, order) is
   the same total order);
2. count per bucket and prefix-sum the counts into per-bucket offsets
   — this window runs over the BUCKET table (bounded: domain/width
   rows, thousands at most), never over the corpus;
3. per-bucket ``row_number`` (parallel across buckets) + broadcast
   offset = exact global rank, two corpus shuffles total.

Neighbor pairs are then an EQUI-join: explode each record into its
w-1 forward gaps and join ``a.rn + gap == b.rn`` — never a non-equi
range join (which would plan as a broadcast nested loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    bucket: Column,
    out_col: str = "rn",
) -> DataFrame:
    """Exact 1-based global rank by ``order_cols`` without a
    single-partition window.

    ``bucket`` must be monotone in the leading order column and of
    bounded cardinality (pick the width from table stats — min/max of
    the key over a fixed bucket budget); correctness needs only
    monotonicity + alignment, parallelism improves with finer buckets.
    """
    b = df.withColumn("__b", bucket)
    counts = b.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    # prefix offsets over the bounded bucket relation (NOT the corpus)
    off_w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        "__b", F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__off")
    )
    in_bucket = Window.partitionBy("__b").orderBy(*[F.col(c) for c in order_cols])
    return (
        b.withColumn("__r", F.row_number().over(in_bucket))
        .join(F.broadcast(offs), "__b")
        .withColumn(out_col, (F.col("__off") + F.col("__r")).cast("bigint"))
        .drop("__b", "__r", "__off")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    order_cols: list[str],
    bucket: Column,
    window: int,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Candidate pairs (one row per ordered pair within the sliding
    window): columns ``a_<c>`` / ``b_<c>`` for each kept column, plus
    ``gap`` (rank distance 1..window-1).  ``a`` is the lower-ranked
    record of the pair.
    """
    if window < 2:
        # sequence(1, window-1) would run DESCENDING (Spark steps -1
        # when start > stop), silently emitting self-pairs (gap 0) and
        # backward pairs — fail loudly instead.
        raise ValueError(f"sorted_neighborhood_pairs needs window >= 2, got {window}")
    keep = keep_cols if keep_cols is not None else df.columns
    ranked = global_row_number(df, order_cols, bucket).select("rn", *keep)
    gaps = F.explode(
        F.sequence(F.lit(1), F.lit(window - 1)).cast("array<bigint>")
    ).alias("gap")
    left = ranked.select(
        F.col("rn"),
        gaps,
        *[F.col(c).alias(f"a_{c}") for c in keep],
    ).withColumn("__probe", F.col("rn") + F.col("gap"))
    right = ranked.select(
        F.col("rn").alias("__probe"), *[F.col(c).alias(f"b_{c}") for c in keep]
    )
    return (
        left.join(right, "__probe")
        .select(
            *[f"a_{c}" for c in keep],
            *[f"b_{c}" for c in keep],
            F.col("gap"),
        )
    )

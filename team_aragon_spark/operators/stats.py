"""Exact distributed order statistics over fixed-precision metrics.

Spark's built-in ``percentile`` aggregate is exact but buffers every
value of a group in one reducer's memory — a genuine OOM hazard on a
100 TB event log.  ``approx_percentile`` (mergeable t-digest/KLL) is
the usual scale answer, but its result is engine-specific, so nothing
it produces can be value-verified against another engine.

This module keeps percentiles EXACT *and* scale-safe for the common
telemetry case where the value domain is fixed-precision (currency,
2-decimal metrics, bucketed latencies): aggregate to the
``(group, value) -> count`` relation first — a map-combined groupBy
whose size is |groups| x |distinct values|, independent of row count —
then run rank arithmetic over that small relation.  The cumulative
rank pass rides ``windows.distributed_cumsums`` (range-sharded
two-level prefix sum), so no task ever sorts a group's event stream
OR its whole count table — a group with millions of distinct values
(few-groups/wide-domain skew, the q243 shape) stays bounded at
~rows/shards per task (the q93/q116 discipline, hardened in r9).

For truly continuous domains the count table degenerates to the row
count and the honest scale path is approx_percentile; callers should
gate on domain cardinality.  Reference parity: the reference engine
exposes no percentile operator at all (656-line pandas ETL); this is
north-star extension surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from team_aragon_spark.operators.windows import distributed_cumsums


def exact_grouped_percentiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    ps: Sequence[float],
    round_digits: int = 6,
) -> DataFrame:
    """Exact linear-interpolation percentiles (the textbook
    ``quantile_cont`` definition: index ``p * (n - 1)`` into the sorted
    values, interpolate ``lo + frac * (hi - lo)``) per group, computed
    distributed-safely via the count-table rank arithmetic described in
    the module docstring.

    Returns one row per group with columns ``p_<pct>`` (e.g. ``p_50``,
    ``p_99``) rounded to ``round_digits``, plus ``n`` (group row
    count).  Cross-engine exactness: both engines compute the index as
    the same IEEE product ``p * (n - 1)`` and the same interpolation
    formula, so after rounding the value compare is stable (proven
    against DuckDB ``quantile_cont`` by q154's oracle).

    Equality with Spark's built-in ``percentile`` aggregate is pinned
    in tests/test_operators.py.
    """
    gcols = list(group_cols)
    cnt = df.groupBy(*gcols, value_col).agg(F.count(F.lit(1)).alias("__c"))
    # The in-group rank cumsum rides the two-level prefix sum (r9):
    # a plain per-group window serializes each group's ENTIRE count
    # table onto one task — with few groups and a wide value domain
    # (3 return-flags x ~20M distinct prices at 100x, the measured
    # q243 wall) that is a single-task sort cliff.  Range sharding on
    # (group, value) bounds every window partition at ~n/shards rows;
    # integer counts sum exactly in any grouping.  The group total
    # comes from a map-combined aggregate instead of a whole-group
    # window partition.
    cum = distributed_cumsums(
        cnt, {"__cum": "__c"}, [F.asc(value_col)], partition_cols=gcols
    )
    tot = cnt.groupBy(*gcols).agg(F.sum("__c").alias("__n"))
    cum = (
        cum.join(F.broadcast(tot), gcols)
        if gcols
        else cum.crossJoin(F.broadcast(tot))
    )
    aggs = [F.first("__n").alias("n")]
    names: list[str] = []
    for p in ps:
        name = f"p_{p * 100:g}".replace(".", "_")  # p_50, p_99, p_99_9
        names.append(name)
        idx = F.lit(float(p)) * (F.col("__n") - F.lit(1)).cast("double")
        fi = F.floor(idx)
        ci = F.ceil(idx)
        lo = F.min(
            F.when(F.col("__cum") >= fi + 1, F.col(value_col))
        ).alias(f"__lo_{name}")
        hi = F.min(
            F.when(F.col("__cum") >= ci + 1, F.col(value_col))
        ).alias(f"__hi_{name}")
        frac = F.first(idx - fi.cast("double")).alias(f"__fr_{name}")
        aggs.extend([lo, hi, frac])
    out = cum.groupBy(*gcols).agg(*aggs)
    sel = [*gcols]
    for name in names:
        sel.append(
            F.round(
                F.col(f"__lo_{name}")
                + F.col(f"__fr_{name}")
                * (F.col(f"__hi_{name}") - F.col(f"__lo_{name}")),
                round_digits,
            ).alias(name)
        )
    sel.append(F.col("n").cast("bigint").alias("n"))
    return out.select(*sel)


def mad_outlier_stats(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    k: float = 5.0,
    round_digits: int = 6,
) -> DataFrame:
    """Robust outlier screen: per group, the median, the MAD (median
    absolute deviation), and the count of rows beyond ``k * MAD`` from
    the median — the breakdown-resistant sibling of the 3-sigma
    z-score screen (q124), immune to the outliers it is hunting
    (mean/stddev are not).

    Exactness discipline (the q124 rule): the median and MAD are
    rounded to ``round_digits`` BEFORE the membership comparison, and
    the comparison operand itself is rounded, so a value sitting on
    the k*MAD edge cannot qualify in one engine and not the other.

    Two passes of :func:`exact_grouped_percentiles` (median of values,
    median of deviations) + one counting aggregate; every shuffle is a
    map-combined groupBy and the per-group stats relation broadcasts.
    The deviation relation (fact scan + broadcast median join) feeds
    both the MAD pass and the final outlier aggregate, so it is
    persisted — cache lifetime is caller-managed, matching the
    documented contract of the other multi-consumer operators.
    """
    gcols = list(group_cols)
    med = (
        exact_grouped_percentiles(df, value_col, gcols, [0.5], round_digits)
        .select(*gcols, F.col("p_50").alias("__med"), F.col("n").alias("__n"))
    )
    dev = df.join(F.broadcast(med), gcols).withColumn(
        "__dev", F.round(F.abs(F.col(value_col) - F.col("__med")), round_digits)
    ).persist()
    mad = (
        exact_grouped_percentiles(dev, "__dev", gcols, [0.5], round_digits)
        .select(*gcols, F.col("p_50").alias("__mad"))
    )
    return (
        dev.join(F.broadcast(mad), gcols)
        .groupBy(*gcols)
        .agg(
            F.first("__med").alias("med"),
            F.first("__mad").alias("mad"),
            F.sum(
                F.when(
                    F.round(F.col("__dev") - F.lit(k) * F.col("__mad"), round_digits)
                    > 0,
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
            F.first("__n").cast("bigint").alias("n"),
        )
    )

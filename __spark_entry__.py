"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real surface lives in ``team_aragon_spark.plans.star_queries``;
this module only re-exports it per the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from team_aragon_spark.plans import star_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue-ratio-by-segment: scan → broadcast join →
    ratio-of-sums hash agg → sort) on /root/testdata/sf0.001."""
    return star_queries.q05_revenue_ratio_by_segment(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return star_queries.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    return star_queries.oracle_sql()

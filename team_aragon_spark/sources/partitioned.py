"""Date-partitioned staging of the star fact tables.

The driver's testdata ships each table as ONE parquet file, so the
F2-F4 date filters can only row-skip inside that file.  The layout an
actual 100 TB deployment uses is hive-partitioned by a date grain —
``orders/o_mon=1995-03/part-*.parquet`` — where the same filters
become PARTITION PRUNING: pruned months are never opened, listed
metadata only.  (The hospital store already proves this for the
reference schema: ``pipeline/sinks.py`` partitions ``hospital_beds``
by ``collection_week``; ``test_store_date_partition_pruning``.)

``staged_orders_by_month`` materializes that layout once per
``sf_dir`` under a deterministic temp path and reads it back, so a
query over it demonstrates the end-to-end prune on the TPC-H-ish star
schema too (see ``q65_partitioned_month_revenue`` and
``tests/test_scale.py::test_partitioned_orders_month_pruning``).

Staging is write-once and atomic via ``sources/staging.py`` (the
shared ``_SUCCESS``-gated, fingerprint-keyed, rename-into-place
discipline) so repeated or concurrent query invocations reuse one
copy.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from team_aragon_spark.sources.staging import stage_once, stage_root

PART_COL = "o_mon"


def staged_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The orders table, hive-partitioned by order month (``o_mon``)."""
    from team_aragon_spark.sources.catalog import read_table

    def _write(tmp: str) -> None:
        (
            read_table(spark, "orders", sf_dir)
            .withColumn(PART_COL, F.date_format("o_orderdate", "yyyy-MM"))
            .repartition(PART_COL)  # one shuffle → one file per month, no small-file spray
            .write.mode("overwrite")
            .partitionBy(PART_COL)
            .parquet(tmp)
        )

    path = os.path.join(
        stage_root(sf_dir, "orders", "aragon_partitioned"), "orders_by_month"
    )
    stage_once(path, _write)
    return spark.read.parquet(path)

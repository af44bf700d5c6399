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

Staging is write-once (``_SUCCESS`` marker) and atomic (write to a
temp suffix, ``os.rename`` into place) so repeated or concurrent
query invocations reuse one copy.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PART_COL = "o_mon"


def _stage_root(sf_dir: str) -> str:
    """Stage key = sf name + source-content fingerprint (mtime+size of
    the source parquet), so regenerated testdata can never silently
    reuse a stale staged copy."""
    sf = os.path.basename(sf_dir.rstrip("/"))
    src = os.path.join(sf_dir, "orders.parquet")
    try:
        st = os.stat(src)
        fp = f"{sf}-{int(st.st_mtime)}-{st.st_size}"
    except OSError:
        fp = sf
    return os.path.join(tempfile.gettempdir(), "aragon_partitioned", fp)


def staged_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The orders table, hive-partitioned by order month (``o_mon``)."""
    from team_aragon_spark.sources.catalog import read_table

    path = os.path.join(_stage_root(sf_dir), "orders_by_month")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = path + f".__stage{os.getpid()}"
        (
            read_table(spark, "orders", sf_dir)
            .withColumn(PART_COL, F.date_format("o_orderdate", "yyyy-MM"))
            .repartition(PART_COL)  # one shuffle → one file per month, no small-file spray
            .write.mode("overwrite")
            .partitionBy(PART_COL)
            .parquet(tmp)
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            os.rename(tmp, path)
        except OSError:
            # Only treat this as a lost concurrency race if the winner's
            # complete copy is actually there; a genuine rename failure
            # (EXDEV, permissions) must NOT destroy the only copy.
            if os.path.exists(os.path.join(path, "_SUCCESS")):
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                raise
    return spark.read.parquet(path)

"""Storage layer: partitioned-parquet tables (primary) + JDBC (parity).

Replaces the reference's Postgres sink (K1/K2: per-row INSERTs at
``load_hhs.py:76-77``, 500-row executemany at ``load_quality.py:51-54``)
with engine-native storage:

- **ParquetStore** — one directory per table; fact tables partitioned
  by their date column so week/date-filtered queries prune partitions
  (F2-F4 become metadata-only file skips).  Appends are atomic at the
  task-commit level (Spark's commit protocol), which replaces the
  reference's txn-per-file/rollback (O4/O5): validation happens
  *before* the sink, so writes cannot fail per-row.

- **jdbc_append** — parity with the reference's "DataFrame → RDBMS"
  path; batching is the JDBC writer's ``batchsize`` (the reference's
  500-row executemany collapses into one option).  Unused by tests
  (no database in this environment) but kept as the documented K1/K2
  mapping.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BATCH_COL = "__batch"


class ParquetStore:
    """Path-based table store with optional date partitioning."""

    PARTITIONED: dict[str, str] = {
        "hospital_beds": "collection_week",
        "hospital_quality": "data_date",
    }

    def __init__(self, root: str):
        self.root = root

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(not f.startswith(("_", ".")) for f in os.listdir(p))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        df = spark.read.parquet(self.path(table))
        if BATCH_COL in df.columns:  # lineage partition, not table schema
            df = df.drop(BATCH_COL)
        return df

    def append(self, df: DataFrame, table: str) -> None:
        writer = df.write.mode("append")
        part_col = self.PARTITIONED.get(table)
        if part_col:
            writer = writer.partitionBy(part_col)
        writer.parquet(self.path(table))

    def append_batch(self, df: DataFrame, table: str, batch_id: str) -> None:
        """Idempotent, replay-safe append (O5 upgrade).

        Each batch lands in its own hive partition (``__batch=<id>``)
        via DYNAMIC partition overwrite: re-running the same batch —
        after a crash mid-write, a retry, or an orchestrator replay —
        overwrites exactly its own partition and nothing else, so a
        batch can never be half-applied or double-applied.  This is
        the Spark-native equivalent of the reference's per-file
        transaction + rollback (``load_hhs.py:147-155``): commit is
        the atomic partition swap, rollback is simply re-running.

        The lineage column is stripped by :meth:`read`; ``compact_table``
        folds old batch partitions back into plain files.  One
        directory per batch: fine for file-per-week cadence, and the
        compactor bounds the accumulation.
        """
        spark = df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        parts = [BATCH_COL] + ([self.PARTITIONED[table]] if table in self.PARTITIONED else [])
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                df.withColumn(BATCH_COL, F.lit(str(batch_id)))
                .write.mode("overwrite")
                .partitionBy(*parts)
                .parquet(self.path(table))
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_table(
    spark: SparkSession,
    store: "ParquetStore",
    table: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite a table into ~``target_file_mb``-sized files.

    Weekly appends leave one small file tree per load; at 100 TB the
    accumulated small files tax every scan (driver listing, task
    scheduling, no intra-file parallelism).  Compaction reads the
    table, repartitions to ceil(bytes / target), and atomically swaps
    directories (write to ``<path>.__compact``, rename over the old
    tree) — readers see either the old or the new complete tree.

    Partitioned tables keep their partition column on rewrite, so
    pruning survives compaction.  Returns the new partition count.
    """
    import math
    import pathlib
    import shutil

    path = store.path(table)
    size = sum(f.stat().st_size for f in pathlib.Path(path).rglob("*") if f.is_file())
    n = max(1, math.ceil(size / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path + ".__compact"
    writer = df.repartition(n).write.mode("overwrite")
    part_col = store.PARTITIONED.get(table)
    if part_col:
        writer = writer.partitionBy(part_col)
    writer.parquet(tmp)
    old = path + ".__old"
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)
    return n


def jdbc_append(df: DataFrame, url: str, table: str, properties: dict | None = None, batchsize: int = 500) -> None:
    """RDBMS sink (K1/K2).  ``batchsize`` mirrors load_quality.py:130."""
    props = {"batchsize": str(batchsize)}
    props.update(properties or {})
    df.write.jdbc(url, table, mode="append", properties=props)

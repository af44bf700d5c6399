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
        return spark.read.parquet(self.path(table))

    def append(self, df: DataFrame, table: str) -> None:
        writer = df.write.mode("append")
        part_col = self.PARTITIONED.get(table)
        if part_col:
            writer = writer.partitionBy(part_col)
        writer.parquet(self.path(table))


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

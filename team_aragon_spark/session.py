"""SparkSession factory with scale-appropriate defaults.

Scale posture (100 TB / 1000-executor design, tested on local[*]):

- AQE on: runtime shuffle-partition coalescing, skew-join splitting,
  and dynamic broadcast-join demotion/promotion replace hand tuning.
- ``spark.sql.shuffle.partitions`` is only the *initial* value; AQE
  coalesces down. For a real cluster set it ~2-3x total cores.
- Session timezone pinned to UTC so date_trunc/window semantics match
  an ANSI oracle (DuckDB timestamps are UTC-naive).
- Arrow enabled for the Pandas-UDF paths (vectorized, not per-row).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conf that is safe to (re)apply on an existing session at runtime.
RUNTIME_CONF = {
    # Runtime-settable, so tune() can fix it on an externally-built
    # session too: Spark's default of 200 shuffle partitions means 200
    # scheduled tasks per shuffle regardless of data size — pure
    # overhead at local scale.  AQE coalescing trims further at runtime.
    "spark.sql.shuffle.partitions": str(
        int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    ),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "team-aragon-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # local mode runs driver + all executor threads in ONE JVM, so
        # this heap is the entire engine's memory; 8g starved 32
        # concurrent tasks on scaled (100x) inputs into GC-locker OOM.
        # Sized for the 128 GiB box; on a real cluster executor memory
        # is set by the deploy config, not here.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_parallelism(df, min_partitions: int | None = None):
    """Repartition a DataFrame that arrived under-split.

    Small parquet files scan as 1 split, which serializes CPU-heavy
    per-row operators (hashing, shingling, decode) on one core.  A
    round-robin repartition costs one tiny shuffle and buys full
    cluster width.  At 100 TB inputs are already wide, so this is a
    no-op there (the check is partition count, not size).
    """
    n = min_partitions or default_parallelism()
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine conf to a session we did not create.

    The driver harness hands ``entry(spark)`` an externally-built
    session; static conf (memory, master) can't change, but AQE /
    timezone / Arrow can and must (UTC pinning is required for oracle
    comparison correctness, not just performance).
    """
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf locked by a strict harness
            pass
    return spark

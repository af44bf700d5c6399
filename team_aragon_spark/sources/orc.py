"""ORC staging of the events stream — the columnar-interchange leg of
the source matrix next to parquet (native), CSV (reference parity),
JSONL (q325), and JDBC (Derby round-trip).

Events is deliberately the table staged here because its surface is
the one ORC historically gets wrong: timestamps.  ORC's plain
TIMESTAMP type is WALL-CLOCK (no zone): Spark renders an instant into
the session timezone on write and reads it back as timestamp_ntz, so
under any non-UTC session (the grading driver pins
America/New_York) the round-trip crosses a DST-ambiguous hour twice —
the repeated 1 a.m. on fall-back is unrecoverable BY SPEC, not by
bug.  The interchange-safe practice this module therefore implements
is the standard one: stage the instant as an epoch-microsecond
BIGINT (``ts_us``), which is type-faithful, zone-free, and
deterministic in every engine, and document the wall-clock trap
instead of silently shipping it.  ``q329_orc_ingest_consistency``
pins the fidelity end-to-end: bit_xor digests of ids AND epoch-micro
timestamps from the ORC copy must equal the DuckDB oracle computed on
the original parquet — a one-microsecond shift anywhere flips the
hash.

Write-once / atomic staging discipline: ``sources/staging.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from team_aragon_spark.sources.staging import stage_once, stage_root

EVENTS_ORC_SCHEMA = (
    "event_id bigint, ts_us bigint, user_id bigint, "
    "event_type string, value double, props string"
)


def staged_events_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table staged as ORC (instants as epoch-microsecond
    bigints — see the module doc for why ORC's wall-clock TIMESTAMP
    cannot round-trip under a non-UTC session) and read back with the
    declared schema (never inference)."""
    from team_aragon_spark.session import tune
    from team_aragon_spark.sources.catalog import read_table

    tune(spark)  # pins session tz UTC, so the NTZ->LTZ cast below is exact

    def _write(tmp: str) -> None:
        (
            read_table(spark, "events", sf_dir)
            # unix_micros rejects TIMESTAMP_NTZ; under the UTC session
            # tz the cast is the identity on the underlying micros
            .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
            .select(
                "event_id", "ts_us", "user_id", "event_type", "value", "props"
            )
            .write.mode("overwrite")
            .orc(tmp)
        )

    path = os.path.join(
        stage_root(sf_dir, "events", "aragon_orc"), "events_orc"
    )
    stage_once(path, _write)
    return spark.read.schema(EVENTS_ORC_SCHEMA).orc(path)
